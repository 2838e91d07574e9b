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


def test_round7_graded_window_composition():
    """Pin the EXACT driver-graded set for this round: an accidental
    registration reorder or a graded/extra flag slip would silently
    leave queries ungraded (the round-1 lesson) — this fails loudly
    instead. Update alongside each round's deliberate rotation.

    Round-7 window = backlog burn-down per the round-6 verdict: the
    28 round-6 additions, the TPC-H mid-tail q7/q9..q20, the eight
    remaining judge-named never-graded extras, and the flagship."""
    from orc_release_hdp_2_6_5_99_1_tag_spark import catalog

    expected = {
        "q1_pricing_summary",
        # TPC-H mid-tail
        "q7_volume_shipping", "q9_product_profit", "q10_returned_items",
        "q11_important_stock", "q12_priority_split",
        "q13_order_distribution", "q14_promo_revenue",
        "q15_top_supplier", "q16_parts_supplier",
        "q17_small_qty_revenue", "q18_large_orders",
        "q19_disjunctive_revenue", "q20_part_promotion",
        # round-6 additions
        "s15_small_file_compaction", "s16_zorder_layout",
        "s17_bucketed_join", "s18_dynamic_partition_pruning",
        "sk2_histogram_quantiles", "sk3_countmin_heavy_hitters",
        "sk4_hll_distinct", "sk5_theta_intersection",
        "a8_correlation_matrix", "a9_groupwise_regression",
        "a10_winsorized_stats", "g4_triangle_count", "g5_pagerank",
        "d18_containment", "d19_boilerplate_scrub",
        "w12_event_funnel", "w13_rfm_segmentation", "w14_twap",
        "w15_last_touch_attribution", "x19_bigram_lm",
        "x20_vocab_growth", "x21_source_divergence",
        "x22_ngram_novelty", "i3_stratified_sample", "v7_knn_join",
        "j3_salted_skew_join", "r11_stream_outer_join",
        "pipe3_segment_funnel",
        # judge-named never-graded extras
        "w4_trailing_window", "w9_window_suite",
        "x5_train_test_split", "x6_repetition_metrics",
        "u3_model_inference", "m3_frame_sample",
        "j1_json_path_extract", "mv1_incremental_agg",
    }
    assert set(catalog.queries()) == expected
    assert len(expected) == 50
