"""Wide-schema behavior — the reference's `TestOrcWideTable.java`
family: ORC files with hundreds/thousands of columns must round-trip,
project down to a handful of columns at the scan (a wide feature table
read for 3 features must not decode 1000), keep per-column footer
stats addressable, and survive schema evolution. Training-data feature
tables are exactly this shape at 100 TB.
"""

from __future__ import annotations

import glob

import pyspark.sql.functions as F

from orc_release_hdp_2_6_5_99_1_tag_spark.plans import formatted_plan
from orc_release_hdp_2_6_5_99_1_tag_spark.sources.footer_tail import parse_tail_of_file
from orc_release_hdp_2_6_5_99_1_tag_spark.sources.orc_io import read_orc, write_orc

_NCOLS = 1000
_NROWS = 500


def _wide_df(spark):
    # c0..c999: ci = id * (i+1), bigints — every column's content is
    # derivable, so spot checks don't need a stored expected table
    cols = [F.col("id")] + [
        (F.col("id") * (i + 1)).alias(f"c{i}") for i in range(_NCOLS)
    ]
    return spark.range(_NROWS).select(*cols)


import pytest


@pytest.fixture(scope="module")
def wide_orc(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("wide") / "wide_orc")
    write_orc(_wide_df(spark).coalesce(1), path)
    return path


def test_wide_roundtrip_and_projection_pushdown(spark, wide_orc):
    """Read 3 of 1001 columns: values exact, and the scan's ReadSchema
    carries ONLY those columns (column pruning at the reader, the
    whole point of a columnar wide table)."""
    df = read_orc(spark, wide_orc).select("id", "c0", "c499", "c999")
    rows = {r["id"]: r for r in df.collect()}
    assert len(rows) == _NROWS
    for i in (0, 123, _NROWS - 1):
        assert (rows[i]["c0"], rows[i]["c499"], rows[i]["c999"]) == (
            i, i * 500, i * 1000,
        )
    plan = formatted_plan(df)
    import re

    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan[:1500]
    read_cols = [c.split(":")[0] for c in m.group(1).split(",")]
    assert sorted(read_cols) == ["c0", "c499", "c999", "id"], read_cols


def test_wide_predicate_pushdown_on_late_column(spark, wide_orc):
    """A predicate on the LAST column still reaches the scan — column
    position must not affect SARG pushdown."""
    from orc_release_hdp_2_6_5_99_1_tag_spark.plans import pushed_filters

    df = read_orc(spark, wide_orc).filter(F.col("c999") == 399_000).select("id")
    assert "c999" in pushed_filters(df)
    assert [r["id"] for r in df.collect()] == [399]


def test_wide_footer_stats_all_columns(spark, wide_orc):
    """The pure-Python tail parser surfaces stats for every one of the
    1001 columns — wide footers exceed the initial 16 KiB tail read,
    exercising the grow-and-retry path the reference uses
    (`ReaderImpl.extractFileTail`)."""
    f = glob.glob(f"{wide_orc}/*.orc")[0]
    tail = parse_tail_of_file(f)
    assert tail["n_rows"] == _NROWS
    cols = {c["name"]: c for c in tail["columns"]}
    assert len(cols) == _NCOLS + 1
    # typed min/max for a spot column: c9 = id*10, so max = 4990
    c9 = cols["c9"]
    assert c9["n_values"] == _NROWS and not c9["has_null"]
    if c9.get("typed"):
        assert c9["typed"].get("max") == (_NROWS - 1) * 10


def test_wide_schema_evolution_add_column(spark, wide_orc):
    """Reading the wide file with a reader schema that appends a new
    column yields NULLs for it — evolution mapping by name holds at
    width."""
    ddl = (
        "id bigint, "
        + ", ".join(f"c{i} bigint" for i in range(_NCOLS))
        + ", brand_new bigint"
    )
    df = read_orc(spark, wide_orc, schema=ddl).select("id", "c7", "brand_new")
    r = df.filter(F.col("id") == 3).collect()[0]
    assert (r["c7"], r["brand_new"]) == (3 * 8, None)  # c7 = id * 8
