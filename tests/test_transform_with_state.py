"""Spark 4 transformWithStateInPandas surface (r9). The runner needs
google.protobuf (absent in this sandbox), so execution is gated: the
unstarted plan must always build and analyze; full oracle parity runs
only where protobuf imports."""

from __future__ import annotations

import pytest


def _has_protobuf() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def test_r9_plan_constructs_and_analyzes(spark, sf_dir):
    from orc_release_hdp_2_6_5_99_1_tag_spark.streaming.stateful import r9_plan

    df = r9_plan(spark, sf_dir)
    assert df.isStreaming
    assert [f.name for f in df.schema.fields] == [
        "user_id",
        "n_events",
        "n_distinct_types",
    ]
    # the analyzed plan carries the stateful operator
    assert "TransformWithState" in df._jdf.queryExecution().analyzed().toString()


@pytest.mark.skipif(
    not _has_protobuf(), reason="transformWithState runner needs google.protobuf"
)
def test_r9_matches_count_distinct_oracle(spark, sf_dir):
    from orc_release_hdp_2_6_5_99_1_tag_spark.streaming.stateful import (
        R9_ORACLE,
        r9_transform_with_state,
    )
    from tests.oracle_utils import compare_query, duckdb_con

    con = duckdb_con(sf_dir)
    try:
        compare_query(r9_transform_with_state(spark, sf_dir), con, R9_ORACLE)
    finally:
        con.close()
