"""Structural invariants for the graph-analytics operators (g4, g5).

The value-exact oracle comparison lives in test_contract; these pin the
properties the oracle cannot see: wedge/triangle consistency, integer
mass conservation, and partition-independence of the integer PageRank
(the whole point of the micro-rank formulation)."""

from __future__ import annotations

from orc_release_hdp_2_6_5_99_1_tag_spark.operators import graph as g


def test_g4_wedge_triangle_consistency(spark, sf_dir):
    row = g.g4_triangle_count(spark, sf_dir).collect()[0]
    assert row["n_nodes"] >= 2
    assert row["n_edges"] >= 1
    # every triangle closes exactly three wedges
    assert 3 * row["n_triangles"] <= row["n_wedges"]
    assert 0.0 <= row["clustering_coeff"] <= 1.0


def test_g5_mass_conservation_and_determinism(spark, sf_dir):
    """Total micro-rank mass never exceeds the scale (DIV only drops
    mass), every rank is at least the damped base, and the result is
    bit-identical under a different shuffle-partition count — the
    integer formulation's reason to exist."""
    rows = g.g5_pagerank(spark, sf_dir).collect()
    assert rows
    und = g._copresence_edges(spark, sf_dir)
    n = (
        und.selectExpr("x AS u").union(und.selectExpr("y AS u")).distinct().count()
    )
    base = (15 * (g._PR_SCALE // n)) // 100
    for r in rows:
        assert r["rank_micro"] >= base
        assert r["rank_micro"] <= g._PR_SCALE
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        rows2 = g.g5_pagerank(spark, sf_dir).collect()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert [tuple(r) for r in rows] == [tuple(r) for r in rows2]
