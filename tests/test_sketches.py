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
