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


def test_round11_graded_window_composition():
    """Pin the EXACT driver-graded set for this round: an accidental
    registration reorder or a graded/extra flag slip would silently
    leave queries ungraded (the round-1 lesson) — this fails loudly
    instead. Update alongside each round's deliberate rotation.

    Round-11 window = the flagship, the round-11 additions graded
    immediately (s25 — the orc_native DataSource surface with the
    nested arrow mapping; t9 — the bucketed ACID merge), the ten
    AGE-6 r4-era verdicts the round-10 verdict ordered re-graded
    before they breach the >6 invariant, eleven of the twenty AGE-5
    r5-era verdicts (the other nine head the round-12 queue), and 26
    scale-critical keep-warm shapes (unchanged from round 10).
    Displaced to extras: the 3 r10 additions + the 20 r10
    refresh-tier queries, all r10-verdict-fresh.
    tests/test_registry_rotation.py asserts the never-green ⊆ graded
    invariant mechanically."""
    from orc_release_hdp_2_6_5_99_1_tag_spark import catalog

    expected = {
        "q1_pricing_summary",
        # round-11 additions
        "s25_orc_native_scan", "t9_bucketed_merge",
        # age-6 (r4-era) verdict refresh — the rotation deadline set
        "f1_predicate_suite", "f12_row_seek",
        "m1_multimodal_features", "m2_grouped_normalize",
        "s5_partition_pruning", "s12_footer_column_stats",
        "s13_corrupt_file_tolerance",
        "x1_token_count", "x3_lang_id", "x4_quality_score",
        # age-5 (r5-era) verdict refresh — 11 of 20
        "a4_merged_file_stats", "d7_decontaminate",
        "d8_paragraph_dedup", "d9_domain_cap",
        "d13_substring_dedup", "d14_substring_scrub",
        "h1_higher_order_functions", "i1_importance_resampling",
        "i2_perplexity_filter", "r9_stream_static_enrichment",
        "s11_orc_meta",
        # keep-warm scale-critical shapes (26, unchanged from r10)
        "s1_orc_roundtrip_scan", "s17_bucketed_join",
        "s18_dynamic_partition_pruning", "s19_rowgroup_stats",
        "a1_column_stats", "q2_correlated_subquery",
        "sk3_countmin_heavy_hitters",
        "d1_exact_dedup", "d2_minhash_lsh", "d12_bloom_decontaminate",
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
