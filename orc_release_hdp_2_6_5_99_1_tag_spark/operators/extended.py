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
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * F.col("l_discount").cast("decimal(8,4)")
            )
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


Q6_ORACLE = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(8,4))) AS DOUBLE) AS revenue,
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
