"""Approximate-sketch scale paths: the HLL++ distinct-count sketch
(the approx variant a6's docstring promises) stays within its error
bound and is mergeable across partitionings — the property that makes
it the 100 TB replacement for exact count-distinct."""

from __future__ import annotations

import pyspark.sql.functions as F

from orc_release_hdp_2_6_5_99_1_tag_spark.tables import load_table


def test_hll_within_error_bound(spark, sf_dir):
    l = load_table(spark, sf_dir, "lineitem")
    exact = l.agg(F.count_distinct("l_orderkey")).collect()[0][0]
    approx = l.agg(F.approx_count_distinct("l_orderkey", rsd=0.02)).collect()[0][0]
    assert abs(approx - exact) / exact < 0.06, (exact, approx)


def test_approx_advisor_decision_parity(spark, sf_dir):
    """The HLL advisor (a6's documented scale path) reaches the same
    use_dictionary verdict as the exact advisor on every column —
    the decision threshold (0.8) tolerates HLL's ~2% error unless a
    column sits exactly on the boundary, which real data doesn't."""
    l = load_table(spark, sf_dir, "lineitem")
    cols = ["l_returnflag", "l_linestatus", "l_orderkey", "l_partkey"]
    aggs = []
    for c in cols:
        aggs += [
            F.count_distinct(F.col(c)).alias(f"e_{c}"),
            F.approx_count_distinct(F.col(c), rsd=0.02).alias(f"a_{c}"),
            F.count(F.col(c)).alias(f"n_{c}"),
        ]
    r = l.agg(*aggs).collect()[0]
    for c in cols:
        exact_dec = r[f"e_{c}"] / r[f"n_{c}"] <= 0.8
        approx_dec = r[f"a_{c}"] / r[f"n_{c}"] <= 0.8
        assert exact_dec == approx_dec, (c, r[f"e_{c}"], r[f"a_{c}"])


def test_hll_partitioning_invariant(spark, sf_dir):
    """Same data, different partitioning → identical HLL estimate
    (deterministic merge, no sampling)."""
    l = load_table(spark, sf_dir, "lineitem")
    a = l.repartition(3).agg(F.approx_count_distinct("l_partkey")).collect()[0][0]
    b = l.repartition(17, "l_returnflag").agg(F.approx_count_distinct("l_partkey")).collect()[0][0]
    assert a == b


def test_approx_percentile_within_tolerance(spark, sf_dir):
    """Scale path for a7's exact percentiles: `approx_percentile`
    (mergeable quantile sketch — map-side partials, no full sort/
    shuffle of the data) must land within 2% relative error of the
    exact quantiles at every tested q."""
    import pyspark.sql.functions as F

    from orc_release_hdp_2_6_5_99_1_tag_spark.tables import load_table

    l = load_table(spark, sf_dir, "lineitem")
    qs = [0.25, 0.5, 0.9, 0.99]
    row = l.agg(
        F.percentile("l_extendedprice", qs).alias("exact"),
        F.percentile_approx("l_extendedprice", qs, 10_000).alias("approx"),
    ).first()
    for q, ex, ap in zip(qs, row.exact, row.approx):
        assert abs(ap - ex) <= 0.02 * abs(ex) + 1e-9, (q, ex, ap)


def test_positional_schema_evolution(spark, sf_dir, tmp_path):
    """C1 positional mapping (`orc.force.positional.evolution`,
    reference OrcConf.java:141-145 / SchemaEvolution positional mode):
    a reader schema whose column NAMES differ entirely still maps by
    position. Spark's ORC reader matches by name, so the engine
    expresses positional mode as an explicit positional rebind
    (`toDF(*reader_names)`) — same file, new names, values intact."""
    import pyspark.sql.functions as F

    from orc_release_hdp_2_6_5_99_1_tag_spark.sources.orc_io import write_orc
    from orc_release_hdp_2_6_5_99_1_tag_spark.tables import load_table

    src = load_table(spark, sf_dir, "nation")
    dest = str(tmp_path / "pos_evo")
    write_orc(src, dest)
    renamed = spark.read.orc(dest).toDF("id", "name", "region_id")
    assert renamed.columns == ["id", "name", "region_id"]
    orig = src.orderBy("n_nationkey").collect()
    new = renamed.orderBy("id").collect()
    assert [tuple(r) for r in orig] == [tuple(r) for r in new]
