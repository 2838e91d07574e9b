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


def test_round9_graded_window_composition():
    """Pin the EXACT driver-graded set for this round: an accidental
    registration reorder or a graded/extra flag slip would silently
    leave queries ungraded (the round-1 lesson) — this fails loudly
    instead. Update alongside each round's deliberate rotation.

    Round-9 window = the flagship, the twelve round-9 additions graded
    immediately (sk6/w16/j4/x23/j5/u5/s20/g6/s21/r12/v8/pipe4 — new
    queries never enter the
    never-green backlog), 11 of the OLDEST verdicts re-graded for
    freshness (r3-era: f6/f7, s9/s10, a3/a5/a6, d3-d5, x2; q3/q5/q6
    defer to round 10), and 26 scale-critical keep-warm shapes
    (x22/sk5/w14/v5/d18/sk4/mv1/i3/r8 displaced by the last nine
    additions; all nine have fresh r8 verdicts and stay
    oracle-checked as extras).
    tests/test_registry_rotation.py asserts the never-green ⊆ graded
    invariant mechanically."""
    from orc_release_hdp_2_6_5_99_1_tag_spark import catalog

    expected = {
        "q1_pricing_summary",
        # round-9 additions
        "sk6_ams_f2", "w16_markov_transitions", "j4_cbo_stats_join",
        "x23_bm25_topk", "j5_variant_shred", "u5_python_udtf",
        "s20_xml_to_orc_convert", "g6_recursive_cte",
        "s21_python_datasource_meta", "r12_python_stream_source",
        "v8_hard_negative_mining", "pipe4_contrastive_pairs",
        # verdict-refresh tier (11 oldest, CORRECTNESS_r03)
        "f6_is_null", "f7_composite_3vl",
        "s9_json_to_orc_convert", "s10_json_schema_inference",
        "a3_boolean_true_count", "a5_raw_data_size",
        "a6_dictionary_advisor",
        "d3_simhash", "d4_ngram_jaccard_topk", "d5_blocklist_antijoin",
        "x2_fingerprint",
        # keep-warm scale-critical shapes (26: +r8 displaced)
        "s1_orc_roundtrip_scan", "s17_bucketed_join",
        "s18_dynamic_partition_pruning", "s19_rowgroup_stats",
        "a1_column_stats", "a9_groupwise_regression",
        "sk3_countmin_heavy_hitters",
        "d1_exact_dedup", "d2_minhash_lsh", "d12_bloom_decontaminate",
        "v1_cosine_topk", "v2_lsh_bucketed_ann", "v4_pq_ann",
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
