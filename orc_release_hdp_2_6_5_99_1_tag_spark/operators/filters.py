"""Filter / predicate operators — reference SearchArgument surface
(SURVEY §2.3, reference `RecordReaderImpl.java:398-654` +
`SargApplier.pickRowGroups:809-895`).

The reference evaluates EQUALS / NULL_SAFE_EQUALS / LESS_THAN[_EQUALS] /
IN / BETWEEN / IS_NULL composed with AND/OR/NOT under three-valued
logic against row-group statistics. In this engine the *semantics* are
Catalyst `Column` predicates (3VL built in); the *pushdown* is
exercised by the ORC-scan queries in operators/orc_queries.py where
`.explain` shows PushedFilters.

The testdata has no NULLs, so NULL-bearing columns are derived with
`nullif` (both here and in the oracle SQL) to cover the truth-table
cases the reference tests in `TestRecordReaderImpl.java:83+`.

Each query returns a compact aggregate fingerprint of the selected
rows (count + key checksum + exact value sum) — enough to detect any
row-selection difference while keeping compare payloads small at any
scale factor.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from orc_release_hdp_2_6_5_99_1_tag_spark.tables import load_table


def _fingerprint(df: DataFrame) -> DataFrame:
    """Order-insensitive summary of the selected lineitem rows."""
    return df.agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("l_orderkey").alias("key_sum"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double").alias("price_sum"),
    )


_FINGERPRINT_SQL = """
SELECT COUNT(*) AS cnt,
       CAST(SUM(l_orderkey) AS BIGINT) AS key_sum,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS price_sum
FROM lineitem
"""


def f1_equals(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return _fingerprint(l.filter(F.col("l_returnflag") == "R"))


F1_ORACLE = _FINGERPRINT_SQL + "WHERE l_returnflag = 'R'"


def f1_predicate_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All five SearchArgument comparison leaves in one graded query —
    EQUALS / NULL_SAFE_EQUALS / LESS_THAN(_EQUALS) / IN / BETWEEN
    (reference `RecordReaderImpl.evaluatePredicateMinMax:494-574`) —
    one labeled fingerprint row per operator. The individual operators
    stay available (f1..f5) for tests; this combined form keeps each
    leaf's verdict visible in a single registry slot.

    Scale: five independent scan+filter+agg branches; each pushes its
    predicate to the scan and aggregates map-side — the union is of
    five 1-row results, so no meaningful shuffle."""
    parts = [
        ("eq", f1_equals),
        ("null_safe_eq", f2_null_safe_equals),
        ("lt_lte", f3_less_than),
        ("in", f4_in_list),
        ("between", f5_between),
    ]
    out = None
    for op, fn in parts:
        branch = fn(spark, sf_dir).select(F.lit(op).alias("op"), "cnt", "key_sum", "price_sum")
        out = branch if out is None else out.unionAll(branch)
    return out.orderBy("op")


def f2_null_safe_equals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`<=>` over two NULL-bearing operands: NULL <=> NULL selects
    (reference NULL_SAFE_EQUALS never returns *_NULL,
    `RecordReaderImpl.java:494-500`)."""
    l = load_table(spark, sf_dir, "lineitem")
    lhs = F.nullif(F.col("l_discount"), F.lit(0.0))
    rhs = F.nullif(F.col("l_tax"), F.lit(0.0))
    return _fingerprint(l.filter(lhs.eqNullSafe(rhs)))


F2_ORACLE = (
    _FINGERPRINT_SQL
    + "WHERE NULLIF(l_discount, 0.0) IS NOT DISTINCT FROM NULLIF(l_tax, 0.0)"
)


def f3_less_than(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return _fingerprint(l.filter((F.col("l_quantity") < 10) & (F.col("l_discount") <= 0.02)))


F3_ORACLE = _FINGERPRINT_SQL + "WHERE l_quantity < 10 AND l_discount <= 0.02"


def f4_in_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return _fingerprint(
        l.filter(F.col("l_linenumber").isin(1, 3, 5) & F.col("l_returnflag").isin("A", "N"))
    )


F4_ORACLE = _FINGERPRINT_SQL + "WHERE l_linenumber IN (1,3,5) AND l_returnflag IN ('A','N')"


def f5_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return _fingerprint(
        l.filter(
            F.col("l_quantity").between(10, 20)
            & F.col("l_shipdate").between(
                F.lit("1996-01-01 00:00:00").cast("timestamp"),
                F.lit("1997-12-31 00:00:00").cast("timestamp"),
            )
        )
    )


F5_ORACLE = (
    _FINGERPRINT_SQL
    + "WHERE l_quantity BETWEEN 10 AND 20 AND l_shipdate BETWEEN"
    " TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1997-12-31 00:00:00'"
)


def _suite_branch(op: str, oracle: str) -> str:
    return f"SELECT '{op}' AS op, cnt, key_sum, price_sum FROM ({oracle}) t_{op}"


F1_SUITE_ORACLE = (
    " UNION ALL ".join(
        _suite_branch(op, oracle)
        for op, oracle in [
            ("eq", F1_ORACLE),
            ("null_safe_eq", F2_ORACLE),
            ("lt_lte", F3_ORACLE),
            ("in", F4_ORACLE),
            ("between", F5_ORACLE),
        ]
    )
    + " ORDER BY op"
)


def f6_is_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IS_NULL truth cases over a derived NULL-bearing column
    (reference `hasNull` path, `RecordReaderImpl.java:575-577`)."""
    l = load_table(spark, sf_dir, "lineitem")
    nullable = F.nullif(F.col("l_discount"), F.lit(0.0))
    return (
        l.groupBy("l_returnflag")
        .agg(
            F.count(F.when(nullable.isNull(), 1)).alias("n_null"),
            F.count(F.when(nullable.isNotNull(), 1)).alias("n_not_null"),
            F.count(nullable).alias("n_values"),
        )
        .orderBy("l_returnflag")
    )


F6_ORACLE = """
SELECT l_returnflag,
       COUNT(CASE WHEN NULLIF(l_discount, 0.0) IS NULL THEN 1 END) AS n_null,
       COUNT(CASE WHEN NULLIF(l_discount, 0.0) IS NOT NULL THEN 1 END) AS n_not_null,
       COUNT(NULLIF(l_discount, 0.0)) AS n_values
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


def f7_composite_3vl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AND/OR/NOT composition over NULL-bearing operands, reporting the
    full three-valued outcome split (TRUE / FALSE / UNKNOWN row counts)
    — the `TruthValue` truth table the reference asserts in
    `TestRecordReaderImpl`."""
    l = load_table(spark, sf_dir, "lineitem")
    nullable_disc = F.nullif(F.col("l_discount"), F.lit(0.0))
    pred = ((nullable_disc > 0.05) & ~(F.col("l_quantity") < 10)) | (
        F.col("l_returnflag") == "R"
    ) & (F.nullif(F.col("l_tax"), F.lit(0.0)) < 0.03)
    return l.agg(
        F.count(F.when(pred, 1)).alias("n_true"),
        F.count(F.when(~pred, 1)).alias("n_false"),
        F.count(F.when(pred.isNull(), 1)).alias("n_unknown"),
    )


F7_ORACLE = """
SELECT
  COUNT(CASE WHEN p THEN 1 END) AS n_true,
  COUNT(CASE WHEN NOT p THEN 1 END) AS n_false,
  COUNT(CASE WHEN p IS NULL THEN 1 END) AS n_unknown
FROM (
  SELECT ((NULLIF(l_discount, 0.0) > 0.05 AND NOT (l_quantity < 10))
          OR (l_returnflag = 'R' AND NULLIF(l_tax, 0.0) < 0.03)) AS p
  FROM lineitem
) t
"""


def f12_row_seek(
    spark: SparkSession, sf_dir: str, *, start: int = 101, stop: int = 110
) -> DataFrame:
    """Row seek (reference `seekToRow`, `RecordReaderImpl.java:1251-1320`)
    as a two-phase distributed offset scan — no global single-reducer
    window over the data.

    Phase 1 buckets the sort key into coarse ranges and aggregates a
    count per bucket (map-side combine, one small shuffle). The running
    offset is a window over *bucket counts* (two longs per bucket, ~rows/
    BUCKET entries — the only ordered window, and it never sees data
    rows). Phase 2 keeps only the bucket(s) whose offset span intersects
    the target row range — a broadcast semi-join whose key-range
    predicate Catalyst can push to the scan — and numbers rows *within*
    each bucket, adding the bucket's global offset. Mirrors the
    reference's stripe-stats seek: `pickRowGroups` first, then a cursor
    inside the selected stripe.
    """
    l = load_table(spark, sf_dir, "lineitem")
    bucket_width = 1 << 10
    b = (F.col("l_orderkey") / bucket_width).cast("bigint")
    counts = l.groupBy(b.alias("b")).agg(F.count(F.lit(1)).alias("cnt"))
    w_off = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.withColumn(
        "off", F.coalesce(F.sum("cnt").over(w_off), F.lit(0))
    )
    hit = offsets.filter(
        (F.col("off") < F.lit(stop)) & (F.col("off") + F.col("cnt") >= F.lit(start))
    )
    bounded = l.join(F.broadcast(hit), b == F.col("b"))
    w_in = Window.partitionBy("b").orderBy("l_orderkey", "l_linenumber")
    return (
        bounded.withColumn("rn", F.col("off") + F.row_number().over(w_in))
        .filter(F.col("rn").between(start, stop))
        .select("rn", "l_orderkey", "l_linenumber", "l_quantity")
    )


F12_ORACLE = """
SELECT rn, l_orderkey, l_linenumber, l_quantity
FROM (
  SELECT ROW_NUMBER() OVER (ORDER BY l_orderkey, l_linenumber) AS rn,
         l_orderkey, l_linenumber, l_quantity
  FROM lineitem
) t
WHERE rn BETWEEN 101 AND 110
"""
