"""Cross-implementation golden-file tests (reference §5.4 strategy:
`examples/*.orc` + `examples/expected/*.jsn.gz`): the engine reads the
reference's own canonical ORC files — written by ORC 1.4-era Java and
C++ writers, v0.11 and v0.12 formats, zlib/snappy codecs — and
matches the published expected contents.

Known divergences (documented, asserted):
- `uniontype` files: Spark's ORC reader has no union type; the
  engine's tagged-struct convention (functions/union_type.py) is the
  supported path for union DATA it writes itself.
- `version1999.orc` (file claiming writer version 1999.0.999): the
  reference reads unknown FUTURE versions permissively; Spark's reader
  rejects the file.
"""

from __future__ import annotations

import gzip
import json
import os

import pytest

EX = "/root/reference/examples"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(EX), reason="reference examples not present"
)

GOLDEN_ROWS = [
    ("demo-11-zlib.orc", 1_920_800, 9),   # v0.11 format (RLEv1 era)
    ("demo-12-zlib.orc", 1_920_800, 9),   # v0.12 format
    ("orc-file-11-format.orc", 7_500, 14),
    ("orc_split_elim.orc", 25_000, 5),
    ("over1k_bloom.orc", 2_098, 11),
    ("decimal.orc", 6_000, 1),
    ("nulls-at-end-snappy.orc", 70_000, 7),
    ("TestOrcFile.testSnappy.orc", 10_000, 2),
    ("TestOrcFile.testDate1900.orc", 70_000, 2),
    ("TestOrcFile.emptyFile.orc", 0, 12),
]


@pytest.mark.parametrize("fname,rows,cols", GOLDEN_ROWS)
def test_reads_reference_golden(spark, fname, rows, cols):
    df = spark.read.orc(os.path.join(EX, fname))
    assert len(df.columns) == cols
    assert df.count() == rows


def test_test1_matches_expected_json(spark):
    """Deep value compare against the published expected dump
    (`examples/expected/TestOrcFile.test1.jsn.gz`)."""
    df = spark.read.orc(os.path.join(EX, "TestOrcFile.test1.orc"))
    got = sorted(
        (r.asDict(recursive=True) for r in df.collect()), key=lambda r: r["int1"]
    )
    with gzip.open(os.path.join(EX, "expected", "TestOrcFile.test1.jsn.gz")) as fh:
        want = sorted((json.loads(line) for line in fh), key=lambda r: r["int1"])
    assert len(got) == len(want) == 2
    for g, w in zip(got, want):
        for k in ["boolean1", "byte1", "short1", "int1", "long1", "float1", "double1", "string1"]:
            assert g[k] == w[k], (k, g[k], w[k])
        assert [e["int1"] for e in g["list"]] == [e["int1"] for e in w["list"]]


def test_decimal_golden_contents(spark):
    """decimal.orc: 6000 decimal(10,5) values; checksum vs the
    expected dump."""
    import pyspark.sql.functions as F

    df = spark.read.orc(os.path.join(EX, "decimal.orc"))
    got = df.agg(F.sum(F.col("_col0")).cast("string").alias("s")).collect()[0].s
    from decimal import Decimal

    with gzip.open(os.path.join(EX, "expected", "decimal.jsn.gz")) as fh:
        vals = [json.loads(line, parse_float=str)["_col0"] for line in fh]
    want = sum(Decimal(v) for v in vals if v is not None)
    assert Decimal(got) == want


def test_zero_rows_golden_with_explicit_schema(spark):
    """zero.orc: schema inference fails on a 0-row file, but an
    explicit reader schema (C1 evolution path) reads it — the
    reference's `zero.orc` case."""
    ddl = (
        "boolean1 boolean, byte1 tinyint, short1 smallint, int1 int,"
        " long1 bigint, float1 float, double1 double, bytes1 binary,"
        " string1 string,"
        " middle struct<list: array<struct<int1: int, string1: string>>>,"
        " list array<struct<int1: int, string1: string>>,"
        " map map<string, struct<int1: int, string1: string>>"
    )
    df = spark.read.schema(ddl).orc(os.path.join(EX, "zero.orc"))
    assert df.count() == 0
    assert len(df.columns) == 12


def test_split_elim_golden_layout(spark):
    """orc_split_elim.orc: the reference's split-elimination fixture —
    25k rows, disjoint userid ranges per row group; a point predicate
    must surface only one row-group's worth of rows from the scan."""
    import pyspark.sql.functions as F

    from orc_release_hdp_2_6_5_99_1_tag_spark.plans.inspect import scan_output_rows

    path = os.path.join(EX, "orc_split_elim.orc")
    df = spark.read.orc(path)
    stats = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("userid").alias("mn"),
        F.max("userid").alias("mx"),
    ).collect()[0]
    assert (stats.n, stats.mn, stats.mx) == (25_000, 2, 100)
    surfaced = scan_output_rows(
        spark.read.orc(path).filter(F.col("userid") == 2).select("userid")
    )
    assert 0 <= surfaced <= 10_000, surfaced


def test_union_type_file_unsupported(spark):
    """Spark cannot read ORC uniontype files — the documented gap the
    tagged-struct convention covers for engine-written data."""
    with pytest.raises(Exception):
        spark.read.orc(os.path.join(EX, "TestOrcFile.testUnionAndTimestamp.orc")).count()


def test_future_version_file_rejected(spark):
    """version1999.orc (writer version from the future) — Spark's
    reader rejects it; the reference reads permissively. Divergence
    documented here."""
    with pytest.raises(Exception):
        spark.read.orc(os.path.join(EX, "version1999.orc")).count()
