"""Modern SQL-surface pins (Spark 4): SQL scripting (BEGIN...END
procedural blocks), the Observation API (one-pass side-channel
metrics), and parameterized SQL (named parameter markers). These are
engine-completeness features a reference user migrating to this repo
would reach for; each is pinned against an exact oracle value so a
Spark upgrade that changes semantics fails loudly."""

import pyspark.sql.functions as F
import pytest

from orc_release_hdp_2_6_5_99_1_tag_spark import get_spark
from orc_release_hdp_2_6_5_99_1_tag_spark.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    return get_spark("modern-sql-surface")


def test_sql_scripting_loop_and_variables(spark):
    """Procedural SQL: DECLARE session variables, WHILE loop, SET —
    compute 2^10 by doubling and read the variable back. The script
    returns its final SELECT like a stored procedure would."""
    rows = spark.sql(
        """
        BEGIN
          DECLARE acc BIGINT = 1;
          DECLARE i INT = 0;
          WHILE i < 10 DO
            SET acc = acc * 2;
            SET i = i + 1;
          END WHILE;
          SELECT acc AS two_pow_10, i AS iterations;
        END
        """
    ).collect()
    assert [(r["two_pow_10"], r["iterations"]) for r in rows] == [(1024, 10)]


def test_sql_scripting_over_tables(spark):
    """A script can mix DDL-free control flow with real table reads:
    branch on a scalar from the lineitem table."""
    load_table(spark, SF, "lineitem").createOrReplaceTempView("msl_lineitem")
    rows = spark.sql(
        """
        BEGIN
          DECLARE n BIGINT;
          SET n = (SELECT COUNT(*) FROM msl_lineitem);
          IF n > 0 THEN
            SELECT 'nonempty' AS verdict, n AS n_rows;
          ELSE
            SELECT 'empty' AS verdict, n AS n_rows;
          END IF;
        END
        """
    ).collect()
    exact = load_table(spark, SF, "lineitem").count()
    assert [(r["verdict"], r["n_rows"]) for r in rows] == [("nonempty", exact)]


def test_observation_one_pass_metrics(spark):
    """df.observe collects aggregate metrics as a SIDE CHANNEL of the
    action — at 100 TB this is quality telemetry (row counts, null
    counts, sums) for free on a pipeline's single pass, instead of a
    second scan. Values must equal a dedicated aggregation exactly."""
    from pyspark.sql import Observation

    li = load_table(spark, SF, "lineitem")
    obs = Observation("li_metrics")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("qty_sum"),
        F.count(F.when(F.col("l_returnflag") == "R", 1)).alias("n_returned"),
    )
    # one action drives both the result and the metrics
    n_out = observed.filter(F.col("l_quantity") > 25).count()
    m = obs.get
    ded = li.agg(
        F.count(F.lit(1)),
        F.sum(F.col("l_quantity").cast("decimal(18,2)")),
        F.count(F.when(F.col("l_returnflag") == "R", 1)),
    ).collect()[0]
    assert m["n_rows"] == ded[0]
    assert m["qty_sum"] == ded[1]
    assert m["n_returned"] == ded[2]
    # the observation reflects PRE-filter rows (it sits above the scan,
    # below the filter) while the action's result is post-filter
    assert n_out < m["n_rows"]


def test_parameterized_sql_named_markers(spark):
    """spark.sql named parameter markers (:name) — injection-safe
    parameterization, the API a query service uses instead of string
    interpolation. Literal folding must produce the same result as an
    inline predicate."""
    load_table(spark, SF, "orders").createOrReplaceTempView("msl_orders")
    got = spark.sql(
        "SELECT COUNT(*) AS n FROM msl_orders "
        "WHERE o_orderstatus = :status AND o_totalprice > :floor",
        args={"status": "F", "floor": 1000.0},
    ).collect()[0]["n"]
    want = spark.sql(
        "SELECT COUNT(*) AS n FROM msl_orders "
        "WHERE o_orderstatus = 'F' AND o_totalprice > 1000.0"
    ).collect()[0]["n"]
    assert got == want and got > 0


def test_arrow_optimized_udtf_parity(spark):
    """Arrow-batched UDTF execution (useArrow=True) must produce the
    identical row set as the default pickle-row runner — same logic,
    different exchange lane. At 100 TB the Arrow lane is the one a
    real pipeline runs; parity here means u5-style operators can flip
    the switch without a semantic audit."""
    from pyspark.sql.functions import lit, udtf

    def make(arrow: bool):
        @udtf(returnType="w: string, p: int", useArrow=arrow)
        class Split:
            def eval(self, s: str):
                for i, w in enumerate(s.split()):
                    yield (w, i)

        return Split

    text = "the quick brown fox " * 5
    rows_pickle = sorted(map(tuple, make(False)(lit(text)).collect()))
    rows_arrow = sorted(map(tuple, make(True)(lit(text)).collect()))
    assert rows_pickle == rows_arrow and len(rows_arrow) == 20


def test_variant_parquet_storage_roundtrip(spark, tmp_path):
    """VARIANT is STORABLE, not just computable: a variant column
    written to parquet (Spark's variant logical type) reads back with
    the schema intact and every typed path extraction identical —
    the persist-once-shred-everywhere design point j5's docstring
    cites (and the shape SCALE_STRESS's j5 note recommends at real
    scale)."""
    from pyspark.sql.functions import col, parse_json

    src = spark.createDataFrame(
        [(i, '{"a": %d, "tags": ["x", "y"], "nested": {"z": %d}}' % (i, i * 7))
         for i in range(50)],
        "id bigint, js string",
    ).select("id", parse_json(col("js")).alias("v"))
    out = str(tmp_path / "variant_pq")
    src.write.parquet(out)
    back = spark.read.parquet(out)
    assert dict(back.dtypes)["v"] == "variant"
    got = sorted(
        map(
            tuple,
            back.selectExpr(
                "id",
                "try_variant_get(v, '$.a', 'bigint') AS a",
                "try_variant_get(v, '$.nested.z', 'bigint') AS z",
                "try_variant_get(v, '$.tags[1]', 'string') AS t1",
            ).collect(),
        )
    )
    assert got == [(i, i, i * 7, "y") for i in range(50)]
