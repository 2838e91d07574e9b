"""Bloom-vs-min/max disagreement shapes × NULL_SAFE_EQUALS against
all-null row groups — the remaining TruthValue stats-shape corner of
the reference's PPD truth table (`TestRecordReaderImpl.java:83+`
pickRowGroups cases with bloom filters, and the
`NULL_SAFE_EQUALS` rows of the stats truth table).

The reference's rules under test, end-to-end through the Spark ORC
reader:

- a point value INSIDE a row group's [min, max] but absent from its
  bloom filter must be skipped (bloom overrides a min/max "maybe"),
  and the query must return exactly zero rows — never a false hit;
- a value OUTSIDE min/max is skipped regardless of what the bloom
  filter would say;
- NULL_SAFE_EQUALS with a non-null literal against an ALL-NULL row
  group (stats: hasNull, no min/max) selects nothing, while `<=>`
  semantics still differ from `=` under 3VL for NOT/OR compositions.

The file is written with reference bloom/stride defaults via our
write_orc facade; DuckDB replays the same logical data, so every case
is an exactness check, plus scan-metric checks that the skipping is
real (not just correct).
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from orc_release_hdp_2_6_5_99_1_tag_spark.plans import pushed_filters
from orc_release_hdp_2_6_5_99_1_tag_spark.plans.inspect import scan_output_rows
from orc_release_hdp_2_6_5_99_1_tag_spark.sources.orc_io import read_orc, write_orc

_STRIDE = 1000  # minimum row-index stride → 3 aligned row groups


def _build_rows():
    """3000 rows / three 1000-row blocks engineered for bloom-vs-minmax
    disagreement:

    - i (int):   block0 EVEN values 0..1998 (every odd value is an
                 in-range bloom gap) · block1 ALL NULL · block2
                 CONSTANT 5000; the range (1998, 5000) is a min/max
                 gap no bloom is consulted for
    - st (str):  block0 cycles p0..p49 (absent-but-in-range strings
                 like 'p3x' sort between members) · block1 ALL NULL ·
                 block2 constant 'const'
    """
    rows = []
    for idx in range(3000):
        block = idx // 1000
        if block == 0:
            i, stv = idx * 2, f"p{idx % 50}"
        elif block == 1:
            i, stv = None, None
        else:
            i, stv = 5000, "const"
        rows.append((idx, i, stv))
    return rows


@pytest.fixture(scope="module")
def bloom_orc(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ppd_bloom") / "bloom_orc")
    df = spark.createDataFrame(_build_rows(), "idx bigint, i int, st string").coalesce(1)
    write_orc(df, path, row_index_stride=_STRIDE, bloom_filter_columns="i,st")
    con = duckdb.connect()
    con.register("t", pd.DataFrame(_build_rows(), columns=["idx", "i", "st"]))
    yield path, con
    con.close()


def _check(spark, path, con, spark_where: str, duck_where: str):
    got = sorted(
        r["idx"]
        for r in read_orc(spark, path).filter(spark_where).select("idx").collect()
    )
    want = sorted(r[0] for r in con.sql(f"SELECT idx FROM t WHERE {duck_where}").fetchall())
    assert got == want, (
        f"bloom/stats-shape divergence for [{spark_where}]: {len(got)} vs {len(want)} rows"
    )
    return got


# (case id, spark predicate, duckdb predicate, pushdown col or None)
_CASES = [
    # --- bloom gap: inside [min,max], absent from the filter ---------
    ("bloom_gap_eq", "i = 501", "i = 501", "i"),
    ("bloom_gap_in", "i IN (501, 503, 999)", "i IN (501, 503, 999)", "i"),
    ("bloom_hit_eq", "i = 500", "i = 500", "i"),
    ("bloom_mixed_in", "i IN (500, 501, 5000)", "i IN (500, 501, 5000)", "i"),
    # --- min/max gap between blocks: bloom never consulted -----------
    ("minmax_gap_eq", "i = 3001", "i = 3001", "i"),
    ("const_block_eq", "i = 5000", "i = 5000", "i"),
    # --- NULL_SAFE_EQUALS vs the all-null row group ------------------
    ("nse_hit", "i <=> 500", "i IS NOT DISTINCT FROM 500", "i"),
    ("nse_bloom_gap", "i <=> 501", "i IS NOT DISTINCT FROM 501", "i"),
    ("nse_const_block", "i <=> 5000", "i IS NOT DISTINCT FROM 5000", "i"),
    ("nse_null_literal", "i <=> NULL", "i IS NOT DISTINCT FROM NULL", None),
    ("eq_never_null", "i = NULL", "i = NULL", None),
    # --- 3VL compositions over the all-null group --------------------
    ("not_eq_3vl", "NOT (i = 500)", "NOT (i = 500)", "i"),
    ("not_nse_3vl", "NOT (i <=> 500)", "NOT (i IS NOT DISTINCT FROM 500)", None),
    ("or_across_groups", "i = 501 OR i = 5000", "i = 501 OR i = 5000", "i"),
    # --- string bloom shapes -----------------------------------------
    ("st_bloom_gap", "st = 'p3x'", "st = 'p3x'", "st"),
    ("st_bloom_hit", "st = 'p7'", "st = 'p7'", "st"),
    ("st_nse_const", "st <=> 'const'", "st IS NOT DISTINCT FROM 'const'", "st"),
    ("st_allnull_isnull", "st IS NULL", "st IS NULL", "st"),
    ("mixed_col_or", "i = 501 OR st = 'p7'", "i = 501 OR st = 'p7'", None),
]


@pytest.mark.parametrize("case", _CASES, ids=[c[0] for c in _CASES])
def test_bloom_stats_shape_exactness(spark, bloom_orc, case):
    name, spark_where, duck_where, push_col = case
    path, con = bloom_orc
    _check(spark, path, con, spark_where, duck_where)
    if push_col is not None:
        df = read_orc(spark, path).filter(spark_where).select("idx")
        pf = pushed_filters(df)
        assert push_col in pf, f"predicate not pushed to the ORC scan for {name}: {pf!r}"


def test_bloom_gap_skips_row_groups(spark, bloom_orc):
    """The disagreement case must SKIP, not just return zero rows: for
    an in-range bloom-gap literal the scan surfaces (at most) the one
    row group whose bloom false-positive rate lets it through — never
    the whole block0 that min/max alone would admit."""
    path, _ = bloom_orc
    df = read_orc(spark, path).filter("i = 501").select("i")
    surfaced = scan_output_rows(df)
    assert surfaced <= _STRIDE, (
        f"bloom gap surfaced {surfaced} rows; bloom-index skipping not effective"
    )


def test_minmax_gap_skips_every_group(spark, bloom_orc):
    """A literal in the (1998, 5000) inter-block min/max gap is skipped
    by stats alone in every row group."""
    path, _ = bloom_orc
    df = read_orc(spark, path).filter("i = 3001").select("i")
    assert scan_output_rows(df) == 0


def test_nse_nonnull_literal_skips_allnull_group(spark, bloom_orc):
    """The reference's NULL_SAFE_EQUALS truth-table row: against the
    all-null row group a non-null `<=>` literal admits nothing, so the
    scan surfaces at most the true-hit group."""
    path, _ = bloom_orc
    df = read_orc(spark, path).filter("i <=> 500").select("i")
    assert scan_output_rows(df) <= _STRIDE
