"""Contract test: every catalog entry runs, and every oracle matches
DuckDB exactly under the driver's compare semantics."""

from __future__ import annotations

import pytest

from orc_release_hdp_2_6_5_99_1_tag_spark import catalog
from tests.oracle_utils import duckdb_con, compare_query


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.schema is not None


def _all_queries():
    return {**catalog.queries(), **catalog.extra_queries()}


def _all_oracles():
    return {**catalog.oracle_sql(), **catalog.extra_oracle_sql()}


def test_graded_window_not_exceeded():
    """The driver grades only the first GRADED_WINDOW registrations —
    anything beyond gets no correctness verdict (round-1 lesson)."""
    assert len(catalog.queries()) <= catalog.GRADED_WINDOW


@pytest.mark.parametrize("name", sorted(_all_queries().keys()))
def test_query_against_oracle(spark, sf_dir, name):
    q = _all_queries()[name]
    df = q(spark, sf_dir)
    oracle = _all_oracles().get(name)
    if oracle is None:
        assert df.count() >= 0  # rows-only check, mirrors driver fallback
        return
    con = duckdb_con(sf_dir)
    try:
        compare_query(df, con, oracle)
    finally:
        con.close()


def test_round10_graded_window_composition():
    """Pin the EXACT driver-graded set for this round: an accidental
    registration reorder or a graded/extra flag slip would silently
    leave queries ungraded (the round-1 lesson) — this fails loudly
    instead. Update alongside each round's deliberate rotation.

    Round-10 window = the flagship, the round-10 additions graded
    immediately (v9/s22/s23), the ten STALE r1-era verdicts the
    round-9 verdict ordered re-graded (q3/q5/q6, w1, w2 — whose
    latest driver verdict was the r2 err — g1, p2, a7, f9, q22),
    the r3-era trio (f8/u1/t1) and five r4-era re-grades
    (s3/p1/e1/c1/c2) for verdict freshness, the two CODE-CHANGE
    re-grades (s21/r12 — pyds.py switched to Arrow batch emission
    this round), and 26 scale-critical keep-warm shapes (unchanged
    from round 9). Displaced to extras: the 10 r9 additions + the 11
    r9 refresh-tier queries, all r9-verdict-fresh.
    tests/test_registry_rotation.py asserts the never-green ⊆ graded
    invariant mechanically."""
    from orc_release_hdp_2_6_5_99_1_tag_spark import catalog

    expected = {
        "q1_pricing_summary",
        # round-10 additions
        "v9_hybrid_rrf", "s22_partial_read", "s23_bounded_tail_read",
        # stale r1-era verdict refresh
        "q3_shipping_priority", "q5_local_supplier_volume",
        "q6_revenue_delta", "w1_topk_per_group", "w2_sessionize",
        "g1_rollup", "p2_pivot", "a7_percentiles",
        "f9_string_patterns", "q22_not_exists",
        # r3-era verdict refresh
        "f8_predicate_coercion", "u1_union_type", "t1_nested_roundtrip",
        # r4-era verdict refresh
        "s3_bloom_point_lookup", "p1_projection_pushdown",
        "e1_codec_roundtrip", "c1_schema_evolution", "c2_cast_matrix",
        # code-change re-grades (Arrow-batched pyds)
        "s21_python_datasource_meta", "r12_python_stream_source",
        # keep-warm scale-critical shapes (26, unchanged from r9)
        "s1_orc_roundtrip_scan", "s17_bucketed_join",
        "s18_dynamic_partition_pruning", "s19_rowgroup_stats",
        # a9 (r9-green) -> extras mid-round-10: q2's last driver
        # verdict was ROUND 2 — the oldest in the registry, missed by
        # the r1-era-only stale sweep
        "a1_column_stats", "q2_correlated_subquery",
        "sk3_countmin_heavy_hitters",
        "d1_exact_dedup", "d2_minhash_lsh", "d12_bloom_decontaminate",
        # v4_pq_ann → extras mid-round-10, displaced by the new
        # s24_lake_scan (ANN keeps v1/v2/v7 graded; v4 r9-green)
        "v1_cosine_topk", "v2_lsh_bucketed_ann", "s24_lake_scan",
        "v7_knn_join",
        "k1_kmeans_clusters",
        "g4_triangle_count", "g5_pagerank",
        "t2_acid_merge_on_read", "t3_compaction",
        "r2_streaming_windowed_agg",
        "r11_stream_outer_join",
        "w3_asof_join",
        "j3_salted_skew_join",
        "pipe1_training_data_prep", "pipe2_curation_funnel",
        "pipe3_segment_funnel",
    }
    assert set(catalog.queries()) == expected
    assert len(expected) == 50
