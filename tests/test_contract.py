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


@pytest.mark.parametrize("name", sorted(catalog.queries().keys()))
def test_query_against_oracle(spark, sf_dir, name):
    q = catalog.queries()[name]
    df = q(spark, sf_dir)
    oracle = catalog.oracle_sql().get(name)
    if oracle is None:
        assert df.count() >= 0  # rows-only check, mirrors driver fallback
        return
    con = duckdb_con(sf_dir)
    try:
        compare_query(df, con, oracle)
    finally:
        con.close()
