"""Temporal join operators for training-data pipelines (SURVEY §2.13
adjacency): point-in-time (as-of) join — the feature-store staple
Spark's DataFrame API lacks as a built-in.

Spark-first formulation: the classic merge-sorted union. Both sides
union into one stream tagged by side, one shuffle partitions by the
equality key, and a running `last(..., ignorenulls=True)` window
carries the most recent right-side row forward onto each left row.
Cost is ONE hash exchange on the key + an in-partition sort — the
same shape as a sort-merge join, with no range-condition blowup (a
naive `l.ts >= r.ts` join would be quadratic per key). Skewed keys
ride AQE; there is no broadcast assumption, so both sides scale.

Oracle: DuckDB's native ASOF JOIN.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from orc_release_hdp_2_6_5_99_1_tag_spark.tables import load_table


def w3_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every click event, attach the user's most recent purchase at
    or before the click (inclusive as-of semantics: a purchase in the
    same microsecond matches — the `side` tiebreak orders right-side
    rows first). Clicks with no prior purchase keep NULLs (left join).
    Output is all-numeric: the time distance is an exact microsecond
    delta, so the oracle compare is rendering-proof."""
    e = load_table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.lit(1).alias("side"),
        "event_id",
        "value",
        F.lit(None).cast("timestamp").alias("p_ts"),
        F.lit(None).cast("double").alias("p_value"),
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(0).alias("side"),
        F.lit(None).cast("bigint").alias("event_id"),
        F.lit(None).cast("double").alias("value"),
        F.col("ts").alias("p_ts"),
        F.col("value").alias("p_value"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = clicks.unionByName(purchases)
    # carry the purchase as ONE struct through a single ignorenulls
    # window: two independent windows would skip a NULL-valued field
    # back to an older purchase and stitch fields from different rows
    p_row = F.when(
        F.col("side") == 0, F.struct(F.col("p_ts"), F.col("p_value"))
    )
    return (
        merged.withColumn("last_p", F.last(p_row, ignorenulls=True).over(w))
        .filter(F.col("side") == 1)
        .select(
            "event_id",
            "user_id",
            "value",
            F.col("last_p.p_value").alias("purchase_value"),
            (F.unix_micros("ts") - F.unix_micros("last_p.p_ts")).alias(
                "micros_since_purchase"
            ),
        )
        .orderBy("event_id")
    )


W3_ORACLE = """
SELECT l.event_id, l.user_id, l.value,
       r.value AS purchase_value,
       epoch_us(l.ts) - epoch_us(r.ts) AS micros_since_purchase
FROM (SELECT * FROM events WHERE event_type = 'click') l
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
  ON l.user_id = r.user_id AND l.ts >= r.ts
ORDER BY l.event_id
"""


def w4_trailing_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing time-range window (feature-store staple: 'activity in
    the last hour at event time'): per user, for every event, the
    count and exact-decimal sum of that user's events in the preceding
    hour INCLUDING the current row — a RANGE frame over exact epoch
    MICROSECONDS (identical integer keys in both engines; DuckDB's
    epoch() returns fractional doubles while Spark's unix_timestamp
    truncates, so second-granularity keys would disagree on frame
    membership), not a ROWS frame, so simultaneous events aggregate
    identically regardless of tie order.

    Scale: one shuffle on user_id with in-partition ordering; the
    range frame is evaluated by a sliding cursor, never materializing
    the frame. Output is capped to event_id < 2000 to keep the oracle
    compare small; the window itself runs over the full table."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    vals = e.select(
        "event_id",
        "user_id",
        "ts",
        F.col("value").cast("decimal(18,6)").alias("v"),
    )
    return (
        vals.withColumn("n_trailing_1h", F.count(F.lit(1)).over(w))
        .withColumn("sum_trailing_1h", F.sum("v").over(w).cast("double"))
        .filter(F.col("event_id") < 2000)
        .select("event_id", "user_id", "n_trailing_1h", "sum_trailing_1h")
        .orderBy("event_id")
    )


W4_ORACLE = """
SELECT event_id, user_id, n_trailing_1h, sum_trailing_1h
FROM (
  SELECT event_id, user_id,
         COUNT(*) OVER w AS n_trailing_1h,
         CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sum_trailing_1h
  FROM events
  WINDOW w AS (
    PARTITION BY user_id ORDER BY epoch_us(ts)
    RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
  )
) t
WHERE event_id < 2000
ORDER BY event_id
"""


def w5_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention analysis: users grouped by their first-activity
    day (the cohort), counted distinct on each subsequent day offset
    0..7 — the product-analytics staple over an event stream.

    Scale: cohort assignment is one groupBy(user_id) (the user dim);
    joining it back onto events shuffles once on user_id; the final
    (cohort, offset) aggregate is tiny. No window functions, no global
    sort — identical shape at 100 TB, and AQE handles user skew.
    """
    e = load_table(spark, sf_dir, "events")
    days = e.select("user_id", F.col("ts").cast("date").alias("day"))
    first = days.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        days.join(first, "user_id")
        .withColumn("offset", F.datediff("day", "cohort_day"))
        .filter(F.col("offset") <= 7)
        .groupBy("cohort_day", "offset")
        .agg(F.count_distinct("user_id").alias("n_users"))
        .select(
            F.col("cohort_day").cast("string").alias("cohort_day"),
            F.col("offset").cast("int").alias("offset"),
            "n_users",
        )
        .orderBy("cohort_day", "offset")
    )


W5_ORACLE = """
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
), first AS (
  SELECT user_id, MIN(day) AS cohort_day FROM days GROUP BY user_id
)
SELECT CAST(f.cohort_day AS VARCHAR) AS cohort_day,
       CAST(date_diff('day', f.cohort_day, d.day) AS INT) AS "offset",
       COUNT(DISTINCT d.user_id) AS n_users
FROM days d JOIN first f USING (user_id)
WHERE date_diff('day', f.cohort_day, d.day) <= 7
GROUP BY 1, 2 ORDER BY 1, 2
"""


def w6_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap (range) join: for every purchase, count and sum
    the user's clicks inside the following hour [ts, ts+1h], both ends
    inclusive. Purchases with no clicks in-window keep 0/NULL (left).

    Spark-first formulation: a naive `c.ts BETWEEN p.ts AND p.ts+1h`
    join degenerates to a per-user cross product (BroadcastNestedLoop
    at scale). Because the interval length is BOUNDED (1 h), the join
    is blocked on coarse time buckets instead: each interval covers at
    most two 1-hour epoch buckets, so it is exploded to those buckets
    and equi-joined on (user_id, bucket) — one hash shuffle, bounded
    2x duplication, exact containment re-checked on the microsecond
    key afterwards. This is the standard bounded-range-join reduction
    (e.g. Spark's own range-join hints on Databricks): shuffle volume
    scales with data, never with pair count.
    """
    e = load_table(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    bucket_us = 3_600_000_000  # block size == max interval length
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_event_id"),
        "user_id",
        us.alias("start_us"),
        (us + bucket_us).alias("end_us"),
    )
    p_blocked = p.withColumn(
        "bucket",
        F.explode(
            F.array_distinct(
                F.array(
                    F.floor(F.col("start_us") / bucket_us),
                    F.floor(F.col("end_us") / bucket_us),
                )
            )
        ),
    )
    c = e.filter(F.col("event_type") == "click").select(
        "user_id",
        us.alias("c_us"),
        F.col("value").alias("c_value"),
        F.floor(us / bucket_us).alias("bucket"),
    )
    hits = (
        p_blocked.join(c, ["user_id", "bucket"])
        .filter(F.col("c_us").between(F.col("start_us"), F.col("end_us")))
        .groupBy("purchase_event_id")
        .agg(
            F.count(F.lit(1)).alias("n_clicks"),
            F.sum(F.col("c_value").cast("decimal(18,6)")).cast("double").alias("sum_click_value"),
        )
    )
    return (
        p.join(hits, "purchase_event_id", "left")
        .select(
            "purchase_event_id",
            "user_id",
            F.coalesce(F.col("n_clicks"), F.lit(0)).alias("n_clicks"),
            "sum_click_value",
        )
        .orderBy("purchase_event_id")
    )


W6_ORACLE = """
SELECT p.event_id AS purchase_event_id, p.user_id,
       COUNT(c.value) AS n_clicks,
       CAST(SUM(CAST(c.value AS DECIMAL(18,6))) AS DOUBLE) AS sum_click_value
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON c.user_id = p.user_id
 AND epoch_us(c.ts) BETWEEN epoch_us(p.ts) AND epoch_us(p.ts) + 3600000000
GROUP BY 1, 2
ORDER BY purchase_event_id
"""


def w7_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension Type 2: rebuild a versioned dimension
    from an event log. Each user's purchase stream is treated as
    attribute-change records (the attribute is the purchase value
    bucketed to an integer tier); consecutive duplicates collapse, and
    each surviving change gets a validity interval
    [valid_from_us, valid_to_us) closed by the NEXT change
    (open-ended rows carry NULL and is_current = true).

    Scale: two window passes over ONE hash partitioning on user_id
    (change detection via lag, then interval close via lead on the
    collapsed rows) — Catalyst reuses the exchange, so it is a single
    shuffle end-to-end, no self-join against history. Ties at the same
    timestamp are ordered by event_id, making the history
    deterministic under at-least-once replay.
    """
    e = load_table(spark, sf_dir, "events")
    rows = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.unix_micros("ts").alias("at_us"),
        "event_id",
        F.floor(F.col("value") / 100).cast("int").alias("tier"),
    )
    order = Window.partitionBy("user_id").orderBy("at_us", "event_id")
    changed = (
        rows.withColumn("prev_tier", F.lag("tier").over(order))
        .filter(
            F.col("prev_tier").isNull() | (F.col("prev_tier") != F.col("tier"))
        )
        .drop("prev_tier")
    )
    return (
        changed.withColumn("valid_to_us", F.lead("at_us").over(order))
        .select(
            "user_id",
            "tier",
            F.col("at_us").alias("valid_from_us"),
            "valid_to_us",
            F.col("valid_to_us").isNull().alias("is_current"),
        )
        .orderBy("user_id", "valid_from_us")
    )


W7_ORACLE = """
WITH rows_ AS (
  SELECT user_id, epoch_us(ts) AS at_us, event_id,
         CAST(FLOOR(value / 100) AS INT) AS tier
  FROM events WHERE event_type = 'purchase'
), changed AS (
  SELECT user_id, at_us, event_id, tier
  FROM (
    SELECT *, LAG(tier) OVER (PARTITION BY user_id ORDER BY at_us, event_id) AS prev_tier
    FROM rows_
  ) t
  WHERE prev_tier IS NULL OR prev_tier <> tier
)
SELECT user_id, tier, at_us AS valid_from_us,
       LEAD(at_us) OVER (PARTITION BY user_id ORDER BY at_us, event_id) AS valid_to_us,
       LEAD(at_us) OVER (PARTITION BY user_id ORDER BY at_us, event_id) IS NULL AS is_current
FROM changed
ORDER BY user_id, valid_from_us
"""


def w8_ohlc_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous-aggregate rollup: downsample the
    event stream into per-(user, hour) OHLC rows — open/close via
    arg-min/arg-max on event time, high/low extremes, count and an
    exact (decimal) value sum — the timeseries rollup TimescaleDB
    calls a continuous aggregate and every metrics store materializes.

    Spark-first: ONE groupBy((user_id, hour)) with min_by/max_by
    aggregates — all partial-aggregatable (map-side combine ships one
    candidate row per group per partition), no window function, no
    sort. (user_id, ts) is unique in the event stream, so
    min_by/max_by are deterministic; the hour bucket comes from
    date_trunc in both engines. At 100 TB this is the canonical
    downsample: a single corpus-keyed exchange on (user, hour), and
    incremental maintenance composes with mv1's fingerprint-keyed
    partials (new deltas only touch their own hours)."""
    e = load_table(spark, sf_dir, "events")
    hour = F.date_trunc("hour", F.col("ts"))
    return (
        e.groupBy(F.col("user_id"), hour.alias("hour"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min_by("value", "ts").alias("open"),
            F.max_by("value", "ts").alias("close"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.sum(F.col("value").cast("decimal(18,3)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("hour").cast("string").alias("hour"),
            "n_events",
            "open",
            "close",
            "high",
            "low",
            "sum_value",
        )
        .orderBy("user_id", "hour")
    )


W8_ORACLE = """
SELECT user_id,
       CAST(date_trunc('hour', ts) AS VARCHAR) AS hour,
       COUNT(*) AS n_events,
       arg_min(value, ts) AS open,
       arg_max(value, ts) AS close,
       MAX(value) AS high,
       MIN(value) AS low,
       CAST(SUM(CAST(value AS DECIMAL(18,3))) AS DOUBLE) AS sum_value
FROM events
GROUP BY user_id, date_trunc('hour', ts)
ORDER BY user_id, hour
"""


def w9_window_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window-function suite over the event stream: lag/lead
    deltas, running rank/percent_rank/cume_dist, ntile quartiles, and
    per-user first/last values in one windowed projection — the
    remaining SQL-window surface in a single deterministic showcase
    ((user_id, ts) is unique, so every ordering is total).

    Scale: ONE hash exchange on user_id + in-partition sort serves
    every function (all windows share the same partitioning/ordering,
    so Catalyst chains the Window operators without re-partitioning
    or re-sorting between them); the final per-user rollup is
    partial-aggregatable. No unpartitioned window anywhere.
    """
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    per_event = e.select(
        "user_id",
        "event_id",
        "value",
        (F.col("value") - F.lag("value", 1).over(w)).alias("delta_prev"),
        F.lead("event_id", 1).over(w).alias("next_event"),
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
        F.ntile(4).over(w).alias("quartile"),
        F.first("value").over(w).alias("first_value"),
        F.row_number().over(w).alias("rn"),
    )
    return (
        per_event.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.abs(F.col("delta_prev"))).cast("decimal(18,3)").cast("double").alias("abs_delta_sum"),
            F.sum("next_event").alias("next_checksum"),
            F.format_string("%.6f", F.sum("pr")).alias("pr_sum"),
            F.format_string("%.6f", F.sum("cd")).alias("cd_sum"),
            F.sum(F.col("quartile") * F.col("rn")).alias("quartile_checksum"),
            F.min("first_value").alias("first_value"),
        )
        .orderBy("user_id")
    )


W9_ORACLE = """
WITH per_event AS (
  SELECT user_id, event_id, value,
         value - LAG(value, 1) OVER w AS delta_prev,
         LEAD(event_id, 1) OVER w AS next_event,
         PERCENT_RANK() OVER w AS pr,
         CUME_DIST() OVER w AS cd,
         NTILE(4) OVER w AS quartile,
         FIRST_VALUE(value) OVER w AS first_value,
         ROW_NUMBER() OVER w AS rn
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, COUNT(*) AS n,
       CAST(CAST(SUM(ABS(delta_prev)) AS DECIMAL(18,3)) AS DOUBLE) AS abs_delta_sum,
       CAST(SUM(next_event) AS BIGINT) AS next_checksum,
       printf('%.6f', SUM(pr)) AS pr_sum,
       printf('%.6f', SUM(cd)) AS cd_sum,
       CAST(SUM(quartile * rn) AS BIGINT) AS quartile_checksum,
       MIN(first_value) AS first_value
FROM per_event GROUP BY user_id ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# w10: time-grid densify + forward fill (gap fill)
# ---------------------------------------------------------------------------

_GF_USERS = 40  # bound the grid for the oracle compare


def w10_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style gap fill: densify each user's event stream onto
    a complete hourly grid between their first and last hour, carrying
    the most recent observed value forward into the empty hours
    (TimescaleDB's time_bucket_gapfill + locf, the metrics-store
    staple for turning sparse events into regular series).

    Spark-first shape, three strictly bounded steps: (1) the hourly
    rollup is one partial-aggregatable groupBy((user, hour)); (2) the
    grid is sequence(min_hour, max_hour, 1h) exploded per user — a
    narrow generator whose fan-out is the series length, never a
    join; (3) the fill is a single last(ignorenulls) running window
    per user over the grid — one hash exchange on user_id total for
    steps 2+3 (the window reuses the grid's partitioning). No range
    join, no per-hour subquery. At 100 TB users partition cleanly and
    every step stays linear in grid size.
    """
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") < _GF_USERS)
    hour = F.date_trunc("hour", F.col("ts"))
    hourly = e.groupBy(F.col("user_id"), hour.alias("hour")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max_by("value", "ts").alias("last_value"),
    )
    grid = (
        hourly.groupBy("user_id")
        .agg(F.min("hour").alias("mn"), F.max("hour").alias("mx"))
        .select(
            "user_id",
            F.explode(F.expr("sequence(mn, mx, interval 1 hour)")).alias("hour"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(hourly, ["user_id", "hour"], "left")
        .select(
            "user_id",
            "hour",
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.last("last_value", ignorenulls=True).over(w).alias("value_ff"),
            F.col("n_events").isNull().cast("int").alias("filled"),
        )
        .select(
            "user_id",
            F.col("hour").cast("string").alias("hour"),
            "n_events",
            "value_ff",
            "filled",
        )
        .orderBy("user_id", "hour")
    )


W10_ORACLE = f"""
WITH h AS (
  SELECT user_id, date_trunc('hour', ts) AS hour,
         COUNT(*) AS n_events, arg_max(value, ts) AS last_value
  FROM events WHERE user_id < {_GF_USERS}
  GROUP BY user_id, date_trunc('hour', ts)
), b AS (
  SELECT user_id, MIN(hour) AS mn, MAX(hour) AS mx FROM h GROUP BY user_id
), g AS (
  SELECT user_id, unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS hour FROM b
)
SELECT g.user_id,
       CAST(g.hour AS VARCHAR) AS hour,
       COALESCE(h.n_events, 0) AS n_events,
       LAST_VALUE(h.last_value IGNORE NULLS) OVER (
         PARTITION BY g.user_id ORDER BY g.hour
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_ff,
       CAST(h.n_events IS NULL AS INT) AS filled
FROM g LEFT JOIN h ON h.user_id = g.user_id AND h.hour = g.hour
ORDER BY g.user_id, hour
"""


# ---------------------------------------------------------------------------
# w11: interval coalescing (merge overlapping activity intervals)
# ---------------------------------------------------------------------------

_IC_SPAN_US = 30 * 60 * 1_000_000  # each event opens a 30-min activity window


def w11_interval_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval coalescing: every event opens a 30-minute activity
    interval; overlapping/touching intervals per user merge into
    maximal activity islands (the gaps-and-islands classic — uptime
    stitching, session coverage, SLA windows). Reported per user:
    island count, total covered time, longest island.

    Spark-first shape: ONE user_id exchange serves both window passes
    — a running max(end) over preceding rows detects island starts
    (an interval starts a new island iff its start exceeds every
    prior end), a running sum of the start flags numbers the islands,
    and the per-island extent is a plain partial-aggregatable
    groupBy. All arithmetic is exact microsecond integers — no float,
    no timezone rendering — so the oracle compare is bit-stable.
    """
    e = load_table(spark, sf_dir, "events")
    iv = e.select(
        "user_id",
        F.unix_micros(F.col("ts")).alias("s_us"),
        (F.unix_micros(F.col("ts")) + F.lit(_IC_SPAN_US)).alias("e_us"),
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("s_us", "event_id")
    prev_max_end = F.max("e_us").over(w.rowsBetween(Window.unboundedPreceding, -1))
    flagged = iv.withColumn(
        "new_island",
        F.when(prev_max_end.isNull() | (F.col("s_us") > prev_max_end), 1).otherwise(0),
    ).withColumn(
        "island",
        F.sum("new_island").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    islands = flagged.groupBy("user_id", "island").agg(
        F.min("s_us").alias("i_start"),
        F.max("e_us").alias("i_end"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return (
        islands.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_islands"),
            F.sum(F.col("i_end") - F.col("i_start")).alias("covered_us"),
            F.max(F.col("i_end") - F.col("i_start")).alias("longest_us"),
            F.sum("n_events").alias("n_events"),
            F.sum(F.col("i_start") % 1_000_003).alias("start_checksum"),
        )
        .orderBy("user_id")
    )


W11_ORACLE = f"""
WITH iv AS (
  SELECT user_id, epoch_us(ts) AS s_us, epoch_us(ts) + {_IC_SPAN_US} AS e_us, event_id
  FROM events
), flagged AS (
  SELECT user_id, s_us, e_us, event_id,
         CASE WHEN MAX(e_us) OVER (
                PARTITION BY user_id ORDER BY s_us, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
              OR s_us > MAX(e_us) OVER (
                PARTITION BY user_id ORDER BY s_us, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              THEN 1 ELSE 0 END AS new_island
  FROM iv
), numbered AS (
  -- the island cumulative sum MUST use the same (s_us, event_id)
  -- tie-break as the flag pass: with a different tie order a tied
  -- unflagged row could sort before its island's flagged opener and
  -- be numbered into the previous island
  SELECT user_id, s_us, e_us,
         SUM(new_island) OVER (
           PARTITION BY user_id ORDER BY s_us, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM flagged
), islands AS (
  SELECT user_id, island, MIN(s_us) AS i_start, MAX(e_us) AS i_end,
         COUNT(*) AS n_events
  FROM numbered GROUP BY user_id, island
)
SELECT user_id, COUNT(*) AS n_islands,
       CAST(SUM(i_end - i_start) AS BIGINT) AS covered_us,
       CAST(MAX(i_end - i_start) AS BIGINT) AS longest_us,
       CAST(SUM(n_events) AS BIGINT) AS n_events,
       CAST(SUM(i_start % 1000003) AS BIGINT) AS start_checksum
FROM islands GROUP BY user_id ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# w12: sequential event funnel (view -> click -> purchase)
# ---------------------------------------------------------------------------


def w12_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-funnel analysis: per user, the earliest `view`, the
    earliest `click` strictly after that view, and the earliest
    `purchase` strictly after that click — the step-sequence
    conversion query every product-analytics engine ships (and the
    SQL shape behind "did the curation step run before the training
    snapshot" pipeline audits).

    Spark-first shape: the three step times are CHAINED conditional
    window mins over the SAME partitioning key (t1 feeds t2's
    predicate, t2 feeds t3's) — one events scan, ONE shuffle on
    user_id, three JVM-side window passes, then a user-level rollup
    on the already-partitioned rows and a single-row summary. A
    join-gated formulation (step N's table joined back onto the
    stream) re-derives step N−1's subplan inside step N — 6 scans in
    the audit — so the window chain is the 100 TB shape. Conversion
    delay stays exact integer microseconds (no float time math).
    """
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("us")
    )
    wu = Window.partitionBy("user_id")
    x = e.withColumn(
        "t1", F.min(F.when(F.col("event_type") == "view", F.col("us"))).over(wu)
    )
    x = x.withColumn(
        "t2",
        F.min(
            F.when(
                (F.col("event_type") == "click") & (F.col("us") > F.col("t1")),
                F.col("us"),
            )
        ).over(wu),
    )
    x = x.withColumn(
        "t3",
        F.min(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("us") > F.col("t2")),
                F.col("us"),
            )
        ).over(wu),
    )
    per_user = x.groupBy("user_id").agg(
        F.min("t1").alias("t1"), F.min("t2").alias("t2"), F.min("t3").alias("t3")
    )
    return per_user.filter(F.col("t1").isNotNull()).agg(
        F.count(F.lit(1)).alias("n_view"),
        F.count("t2").alias("n_click"),
        F.count("t3").alias("n_purchase"),
        F.round(F.count("t2") / F.count(F.lit(1)), 6).alias("view_to_click"),
        F.round(F.count("t3") / F.count("t2"), 6).alias("click_to_purchase"),
        F.sum(F.col("t3") - F.col("t2")).alias("purchase_delay_us_total"),
    )


W12_ORACLE = """
WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) AS us FROM events
), w1 AS (
  SELECT *, MIN(CASE WHEN event_type = 'view' THEN us END)
              OVER (PARTITION BY user_id) AS t1
  FROM e
), w2 AS (
  SELECT *, MIN(CASE WHEN event_type = 'click' AND us > t1 THEN us END)
              OVER (PARTITION BY user_id) AS t2
  FROM w1
), w3 AS (
  SELECT *, MIN(CASE WHEN event_type = 'purchase' AND us > t2 THEN us END)
              OVER (PARTITION BY user_id) AS t3
  FROM w2
), per_user AS (
  SELECT user_id, MIN(t1) AS t1, MIN(t2) AS t2, MIN(t3) AS t3
  FROM w3 GROUP BY user_id
)
SELECT COUNT(*) AS n_view,
       COUNT(t2) AS n_click,
       COUNT(t3) AS n_purchase,
       ROUND(COUNT(t2) / CAST(COUNT(*) AS DOUBLE), 6) AS view_to_click,
       ROUND(COUNT(t3) / CAST(COUNT(t2) AS DOUBLE), 6) AS click_to_purchase,
       CAST(SUM(t3 - t2) AS BIGINT) AS purchase_delay_us_total
FROM per_user WHERE t1 IS NOT NULL
"""


# ---------------------------------------------------------------------------
# w13: RFM segmentation (recency / frequency / monetary)
# ---------------------------------------------------------------------------

_RFM_ANCHOR = "2024-02-01"  # scoring date (fixed, like a nightly run date)
_RFM_R_DAYS = (3, 7)        # R1 <= 3 days since last purchase, R2 <= 7, else R3
_RFM_F_CUTS = (14, 10)      # F1 >= 14 purchases, F2 >= 10, else F3
_RFM_M_CUTS = (650.0, 450.0)  # M1 >= 650 total spend, M2 >= 450, else M3


def w13_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: per user, days since last purchase
    (R), purchase count (F), total purchase value (M), banded into
    R{1-3}F{1-3}M{1-3} segments with FIXED business thresholds —
    the i2/CCNet pattern: production RFM uses offline-tuned constant
    boundaries, NOT data-dependent terciles, which keeps banding a
    pure map (an ntile(3) over all users would be an un-partitioned
    global window — the exact single-reducer shape the g3 fix
    removed). Users with no purchases fall through to R3/F3/M3.

    Scale: one shuffle on user_id for the per-user rollup
    (map-side-combined conditional aggregates), banding is
    expression-only, and the final per-segment rollup is 27-group
    tiny. Monetary sums are banded on the ROUNDED value so the float
    boundary is engine-identical.
    """
    e = load_table(spark, sf_dir, "events")
    is_p = F.col("event_type") == "purchase"
    u = e.groupBy("user_id").agg(
        F.max(F.when(is_p, F.col("ts").cast("date"))).alias("last_p"),
        F.count(F.when(is_p, F.lit(1))).alias("freq"),
        # exact decimal accumulation: a double SUM is partition-order
        # dependent, and a last-ulp flip at a band boundary would band
        # the user differently between engines/runs
        F.coalesce(
            F.sum(F.when(is_p, F.col("value").cast("decimal(18,2)"))),
            F.lit(0).cast("decimal(18,2)"),
        )
        .cast("double")
        .alias("mon"),
    )
    rec = F.datediff(F.lit(_RFM_ANCHOR).cast("date"), F.col("last_p"))
    r = (
        F.when(rec.isNull(), "R3")
        .when(rec <= _RFM_R_DAYS[0], "R1")
        .when(rec <= _RFM_R_DAYS[1], "R2")
        .otherwise("R3")
    )
    f = (
        F.when(F.col("freq") >= _RFM_F_CUTS[0], "F1")
        .when(F.col("freq") >= _RFM_F_CUTS[1], "F2")
        .otherwise("F3")
    )
    m = (
        F.when(F.col("mon") >= _RFM_M_CUTS[0], "M1")
        .when(F.col("mon") >= _RFM_M_CUTS[1], "M2")
        .otherwise("M3")
    )
    return (
        u.select("user_id", "mon", F.concat(r, f, m).alias("segment"))
        .groupBy("segment")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum(F.col("mon").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_spend"),
            F.sum("user_id").alias("user_checksum"),
        )
        .orderBy("segment")
    )


W13_ORACLE = f"""
WITH u AS (
  SELECT user_id,
         MAX(CASE WHEN event_type = 'purchase' THEN CAST(ts AS DATE) END) AS last_p,
         COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS freq,
         CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase'
                            THEN CAST(value AS DECIMAL(18,2)) END),
                       0) AS DOUBLE) AS mon
  FROM events GROUP BY user_id
), seg AS (
  SELECT user_id, mon,
         concat(
           CASE WHEN last_p IS NULL THEN 'R3'
                WHEN date_diff('day', last_p, DATE '{_RFM_ANCHOR}') <= {_RFM_R_DAYS[0]} THEN 'R1'
                WHEN date_diff('day', last_p, DATE '{_RFM_ANCHOR}') <= {_RFM_R_DAYS[1]} THEN 'R2'
                ELSE 'R3' END,
           CASE WHEN freq >= {_RFM_F_CUTS[0]} THEN 'F1'
                WHEN freq >= {_RFM_F_CUTS[1]} THEN 'F2'
                ELSE 'F3' END,
           CASE WHEN mon >= {_RFM_M_CUTS[0]} THEN 'M1'
                WHEN mon >= {_RFM_M_CUTS[1]} THEN 'M2'
                ELSE 'M3' END
         ) AS segment
  FROM u
)
SELECT segment, COUNT(*) AS n_users,
       CAST(SUM(CAST(mon AS DECIMAL(18,2))) AS DOUBLE) AS total_spend,
       CAST(SUM(user_id) AS BIGINT) AS user_checksum
FROM seg GROUP BY segment ORDER BY segment
"""


# ---------------------------------------------------------------------------
# w14: time-weighted average (TWAP) — duration-weighted rollup of an
# irregular event stream
# ---------------------------------------------------------------------------


def w14_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user TIME-WEIGHTED average of `value` over the irregular
    event stream — each observation holds until the next one, so its
    weight is the microseconds until the user's next event (the TWAP
    of every trading/metrics store; the plain mean over-weights burst
    periods). The last observation of a user has no duration and is
    excluded, the standard left-closed convention. The unweighted
    mean rides along so the burst bias is visible (twap_minus_mean).

    Exactness: weights are integer microseconds (unix_micros /
    epoch_us — no float epoch), values are cast to decimal(18,3)
    before the multiply, and both Σ(value·dt) and Σ(dt) accumulate
    exactly (decimal / bigint). Each sum is then cast to DOUBLE
    *before* the division, so both engines replay the identical
    IEEE sequence cast(Σvd)→double ÷ cast(Σd)→double (the a9/q1
    mirror rule) — dividing the decimals directly would hash-split
    the engines, because Spark quantizes decimal÷integer HALF_UP
    at a fixed scale while DuckDB evaluates it as double division.

    Scale shape: ONE shuffle — the user_id hash exchange feeding the
    lead() window; the per-user rollup is a partial agg riding the
    SAME partitioning (no second exchange), and (user_id, ts) is
    unique in the stream so the window order is total. No global
    sort; the final orderBy is the oracle-compare tail.
    """
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts")
    dt = (F.lead(F.unix_micros(F.col("ts"))).over(w) - F.unix_micros(F.col("ts")))
    seg = e.select(
        "user_id",
        F.col("value").cast("decimal(18,3)").alias("v"),
        dt.alias("dt_us"),
    ).filter(F.col("dt_us").isNotNull())
    return (
        seg.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_intervals"),
            F.sum("dt_us").alias("held_us"),
            F.round(
                F.sum(F.col("v") * F.col("dt_us")).cast("double")
                / F.sum("dt_us").cast("double"),
                6,
            ).alias("twap"),
            F.round(
                F.sum("v").cast("double") / F.count(F.lit(1)).cast("double"), 6
            ).alias("mean_value"),
        )
        .select(
            "user_id",
            "n_intervals",
            "held_us",
            "twap",
            "mean_value",
            F.round(F.col("twap") - F.col("mean_value"), 6).alias("twap_minus_mean"),
        )
        .orderBy("user_id")
    )


W14_ORACLE = """
WITH seg AS (
  SELECT user_id,
         CAST(value AS DECIMAL(18,3)) AS v,
         LEAD(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts)
           - epoch_us(ts) AS dt_us
  FROM events
),
agg AS (
  SELECT user_id,
         COUNT(*) AS n_intervals,
         SUM(dt_us) AS held_us,
         ROUND(CAST(SUM(v * dt_us) AS DOUBLE) / CAST(SUM(dt_us) AS DOUBLE), 6) AS twap,
         ROUND(CAST(SUM(v) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS mean_value
  FROM seg WHERE dt_us IS NOT NULL GROUP BY user_id
)
SELECT user_id,
       CAST(n_intervals AS BIGINT) AS n_intervals,
       CAST(held_us AS BIGINT) AS held_us,
       twap, mean_value,
       ROUND(twap - mean_value, 6) AS twap_minus_mean
FROM agg ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# w15: last-touch attribution — credit each conversion to the user's
# most recent preceding touch event
# ---------------------------------------------------------------------------

_W15_TOUCHES = ("click", "view", "signup")  # attributable channels


def w15_last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marketing-style LAST-TOUCH attribution over the event stream:
    each purchase is credited to the user's most recent PRECEDING
    touch event (click / view / signup; errors and other purchases
    never carry credit), and purchases with no preceding touch land
    in the '(none)' bucket so credit always sums to the purchase
    total. Output per channel: conversions, attributed value (exact
    decimal accumulation), and share of total purchase value.

    Spark-first: the carried 'last touch' is
    last(when(type in touches, type), ignorenulls=True) over
    (user, ts) rows UNBOUNDED PRECEDING..1 PRECEDING — the running
    state machine every attribution system implements, as ONE window
    function (DuckDB: LAST_VALUE ... IGNORE NULLS, same frame).

    Scale shape: ONE user_id hash exchange feeds the window; the
    channel rollup is a handful of groups. (user_id, ts) is unique in
    the stream so the frame order is total — no tiebreak hazard. The
    share-of-total is computed from the rollup's own sums (a 4-row
    window), never a second corpus pass.
    """
    e = load_table(spark, sf_dir, "events")
    touch = F.when(
        F.col("event_type").isin(*_W15_TOUCHES), F.col("event_type")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carried = e.withColumn("touch", F.last(touch, ignorenulls=True).over(w))
    purchases = carried.filter(F.col("event_type") == "purchase").select(
        F.coalesce("touch", F.lit("(none)")).alias("touch_type"),
        F.col("value").cast("decimal(18,3)").alias("v"),
    )
    rollup = purchases.groupBy("touch_type").agg(
        F.count(F.lit(1)).alias("n_conversions"),
        F.sum("v").alias("attributed_value"),
    )
    total = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        rollup.select(
            "touch_type",
            "n_conversions",
            F.col("attributed_value").cast("double").alias("attributed_value"),
            # cast-then-divide: both operands become doubles BEFORE the
            # division so both engines replay the same IEEE op (dividing
            # the decimals would quantize HALF_UP in Spark but run as
            # double division in DuckDB — a 6th-decimal tie hazard)
            F.round(
                F.col("attributed_value").cast("double")
                / F.sum("attributed_value").over(total).cast("double"),
                6,
            ).alias("value_share"),
        )
        .orderBy("touch_type")
    )


W15_ORACLE = f"""
WITH carried AS (
  SELECT event_type, value,
         LAST_VALUE(CASE WHEN event_type IN {_W15_TOUCHES} THEN event_type END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch
  FROM events
),
rollup AS (
  SELECT COALESCE(touch, '(none)') AS touch_type,
         COUNT(*) AS n_conversions,
         SUM(CAST(value AS DECIMAL(18,3))) AS attributed_value
  FROM carried WHERE event_type = 'purchase' GROUP BY 1
)
SELECT touch_type,
       CAST(n_conversions AS BIGINT) AS n_conversions,
       CAST(attributed_value AS DOUBLE) AS attributed_value,
       ROUND(CAST(attributed_value AS DOUBLE)
             / CAST(SUM(attributed_value) OVER () AS DOUBLE), 6) AS value_share
FROM rollup ORDER BY touch_type
"""


# ---------------------------------------------------------------------------
# w16: per-user event-type transition matrix (first-order Markov)
# ---------------------------------------------------------------------------


def w16_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over each user's
    time-ordered event stream: counts and row-normalized probabilities
    of event_type -> next event_type — the behavioral fingerprint
    sequence models train on and the sanity check a curation pipeline
    runs before exporting clickstream corpora.

    Scale shape: ONE hash exchange on user_id feeds the lag() window
    (sequences stay partition-local however long the log grows), then
    a map-side-combinable groupBy on the (prev, next) pair — at most
    |event_type|² groups, kilobytes of final state regardless of the
    row count. Probabilities are ppm-quantized integers (count × 1e6
    DIV row-marginal) so grading is hash-exact; ordering ties on ts
    break by event_id in both engines, making sequences — not just
    counts — deterministic.
    """
    e = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        e.select(
            F.lag("event_type").over(w).alias("prev_type"),
            F.col("event_type").alias("next_type"),
        )
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )
    marg = Window.partitionBy("prev_type")
    return (
        pairs.select(
            "prev_type",
            "next_type",
            F.col("n_transitions").cast("long").alias("n_transitions"),
            F.expr(
                "CAST(n_transitions * 1000000 DIV SUM(n_transitions) "
                "OVER (PARTITION BY prev_type) AS BIGINT)"
            ).alias("p_ppm"),
        )
        .orderBy("prev_type", "next_type")
    )


W16_ORACLE = """
WITH seq AS (
  SELECT LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type,
         event_type AS next_type
  FROM events
),
pairs AS (
  SELECT prev_type, next_type, COUNT(*) AS n_transitions
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY prev_type, next_type
)
SELECT prev_type, next_type,
       CAST(n_transitions AS BIGINT) AS n_transitions,
       CAST(n_transitions * 1000000 // SUM(n_transitions)
            OVER (PARTITION BY prev_type) AS BIGINT) AS p_ppm
FROM pairs
ORDER BY prev_type, next_type
"""
