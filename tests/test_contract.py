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


def test_round12_graded_window_composition():
    """Pin the EXACT driver-graded set for this round: an accidental
    registration reorder or a graded/extra flag slip would silently
    leave queries ungraded (the round-1 lesson) — this fails loudly
    instead. Update alongside each round's deliberate rotation.

    Round-12 window = the flagship, the round-12 additions graded
    immediately (s26 — evolved-lake scan with automatic reader-schema
    election, field-level null-fill and int→bigint widening; s27 —
    the pushed struct sub-field SArg), the two code-change re-grades
    (s24/s25 now run the election path), the NINE r5-era verdicts
    that reach age 7 during r12 (the test-enforced deadline), and 35
    of the 36-strong r6-era cohort (w8 is displaced by the third new
    query s28 — positional evolution — and heads the r13 queue
    alongside the 32 r7-era verdicts). Displaced to extras: t9 + the r11 refresh tiers + the
    r10-era keep-warm block, all r11-verdict-fresh (age 1).
    tests/test_registry_rotation.py asserts the never-green ⊆ graded
    invariant mechanically."""
    from orc_release_hdp_2_6_5_99_1_tag_spark import catalog

    expected = {
        "q1_pricing_summary",
        # round-12 additions
        "s26_evolved_lake_scan", "s27_nested_sarg_scan",
        "s28_positional_lake_scan",
        # code-change re-grades (reader-schema election)
        "s24_lake_scan", "s25_orc_native_scan",
        # the r5-era rotation deadline (age 7 during r12)
        "s14_csv_to_orc_convert", "set1_union_intersect_except",
        "t5_minor_compaction", "v6_two_tier_rerank",
        "x7_pii_redaction", "x8_sequence_pack", "x9_vocab_topk",
        "x16_bpe_pair_stats", "x17_temperature_mix",
        # the r6-era cohort (35 of 36; w8 -> r13)
        "a4_stripe_stats", "d6_embedding_cosine_neardup",
        "d10_dup_clusters", "d11_semdedup",
        "d15_cross_source_overlap", "d16_contamination_report",
        "d17_fuzzy_token_pairs",
        "g2_cube", "g3_hierarchy_depth",
        "j2_join_strategy_parity", "m4_payload_dedup",
        "mv2_affected_key_refresh", "p4_unpivot",
        "q4_order_priority", "q8_market_share",
        "q21_waiting_suppliers",
        "r1_streaming_orc_ingest", "r3_stateful_running_totals",
        "r4_streaming_acid_cdc", "r5_session_windows",
        "r6_stream_dedup", "r7_stream_stream_join",
        "r10_stream_ohlc",
        "sk1_kmv_distinct", "t4_acid_stats", "t8_snapshot_diff",
        "u2_pandas_udf_parity", "u4_map_in_arrow", "v3_ivf_ann",
        "w5_retention_cohorts", "w6_interval_join",
        "w7_scd2_history",
        "w10_gap_fill", "w11_interval_merge",
        "x18_gopher_filters",
    }
    assert set(catalog.queries()) == expected
    assert len(expected) == 50
