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


def test_round6_graded_window_composition():
    """Pin the EXACT driver-graded set for this round: an accidental
    registration reorder or a graded/extra flag slip would silently
    leave queries ungraded (the round-1 lesson) — this fails loudly
    instead. Update alongside each round's deliberate rotation."""
    from orc_release_hdp_2_6_5_99_1_tag_spark import catalog

    expected = {
        "a4_stripe_stats", "d10_dup_clusters", "d11_semdedup",
        "d12_bloom_decontaminate", "d15_cross_source_overlap",
        "d16_contamination_report", "d17_fuzzy_token_pairs",
        "d1_exact_dedup", "d2_minhash_lsh",
        "d6_embedding_cosine_neardup", "g2_cube",
        "g3_hierarchy_depth", "j2_join_strategy_parity",
        "k1_kmeans_clusters", "m4_payload_dedup",
        "mv2_affected_key_refresh", "p4_unpivot",
        "pipe1_training_data_prep", "pipe2_curation_funnel",
        "q1_pricing_summary", "q21_waiting_suppliers",
        "q4_order_priority", "q8_market_share",
        "r10_stream_ohlc", "r1_streaming_orc_ingest",
        "r2_streaming_windowed_agg", "r3_stateful_running_totals",
        "r4_streaming_acid_cdc", "r5_session_windows",
        "r6_stream_dedup", "r7_stream_stream_join",
        "r8_streaming_pipeline", "sk1_kmv_distinct",
        "t2_acid_merge_on_read", "t3_compaction", "t4_acid_stats",
        "t8_snapshot_diff", "u2_pandas_udf_parity",
        "u4_map_in_arrow", "v1_cosine_topk", "v3_ivf_ann",
        "v4_pq_ann", "w10_gap_fill", "w11_interval_merge",
        "w3_asof_join", "w5_retention_cohorts", "w6_interval_join",
        "w7_scd2_history", "w8_ohlc_downsample", "x18_gopher_filters",
    }
    assert set(catalog.queries()) == expected
    assert len(expected) == 50
