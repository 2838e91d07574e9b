"""FIXTURES.md round-trip stress tests — the reference's
`TestVectorOrcFile` strategy (§5.3): write→read equality through ORC
for the canonical nested `bigrow` schema and the timestamp/union/
decimal `typestress` schema, with NULLs at every nesting level,
empty arrays/maps, and boundary values (Long.MAX_VALUE, 1900/2038
timestamps, decimal(38,18) edges)."""

from __future__ import annotations

import datetime
from decimal import Decimal

import pyspark.sql.functions as F
import pyspark.sql.types as T

from orc_release_hdp_2_6_5_99_1_tag_spark.functions import union_decode, union_encode
from orc_release_hdp_2_6_5_99_1_tag_spark.sources.orc_io import read_orc, write_orc

_INNER = T.StructType(
    [T.StructField("int1", T.IntegerType()), T.StructField("string1", T.StringType())]
)
_BIGROW = T.StructType(
    [
        T.StructField("boolean1", T.BooleanType()),
        T.StructField("byte1", T.ByteType()),
        T.StructField("short1", T.ShortType()),
        T.StructField("int1", T.IntegerType()),
        T.StructField("long1", T.LongType()),
        T.StructField("float1", T.FloatType()),
        T.StructField("double1", T.DoubleType()),
        T.StructField("bytes1", T.BinaryType()),
        T.StructField("string1", T.StringType()),
        T.StructField(
            "middle",
            T.StructType([T.StructField("list", T.ArrayType(_INNER))]),
        ),
        T.StructField("list", T.ArrayType(_INNER)),
        T.StructField("map", T.MapType(T.StringType(), _INNER)),
    ]
)

_BIGROW_ROWS = [
    # golden-data shape: boundary values incl. Long.MAX_VALUE
    (True, 1, 1024, 65536, 9223372036854775807, 1.0, -15.0, b"\x00\x01\x02\x03\x04",
     "hi", ([(1, "bye"), (2, "sigh")],), [(3, "good"), (4, "bad")], {}),
    (False, 100, 2048, 65536, 9223372036854775807, 2.0, -5.0, b"", "bye",
     ([(1, "bye"), (2, "sigh")],), [(100000000, "cat"), (-100000, "in"), (1234, "hat")],
     {"chani": (5, "chani"), "mauddib": (1, "mauddib")}),
    # NULLs at every level; empty array
    (None, None, None, None, None, None, None, None, None, None, None, None),
    (True, 0, 0, 0, 0, 0.0, 0.0, b"\xff", "", (None,), [], {"k": None}),
]


def test_bigrow_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(_BIGROW_ROWS, _BIGROW)
    dest = str(tmp_path / "bigrow")
    write_orc(df.repartition(1), dest)
    back = read_orc(spark, dest)
    assert back.schema == _BIGROW
    orig = sorted([r.asDict(recursive=True) for r in df.collect()], key=str)
    got = sorted([r.asDict(recursive=True) for r in back.collect()], key=str)
    assert got == orig


def test_shim_reader_matches_native_on_bigrow(spark, tmp_path):
    """Cross-validate the pyarrow shim (sources/union_reader.py)
    against Spark's native reader on an engine-written nested file:
    both readers must surface identical values — the shim isn't just
    for reference-written union files."""
    from orc_release_hdp_2_6_5_99_1_tag_spark.sources.union_reader import read_orc_tagged

    df = spark.createDataFrame(_BIGROW_ROWS, _BIGROW).drop("map")  # arrow maps
    dest = str(tmp_path / "bigrow_shim")
    write_orc(df.repartition(1), dest)
    native = sorted(
        [r.asDict(recursive=True) for r in read_orc(spark, dest).collect()], key=str
    )
    shim = sorted(
        [r.asDict(recursive=True) for r in read_orc_tagged(spark, dest).collect()],
        key=str,
    )
    assert shim == native


def test_shim_reader_nested_list_map_timestamps(spark, tmp_path):
    """Shim conversion must recurse into list/map children: pyarrow
    surfaces ORC timestamps as ns everywhere, including inside arrays
    and maps, so the ns→us narrowing (and null masks) must apply
    recursively (review finding: the fall-through crashed on
    list<timestamp> and list<union>)."""
    import datetime

    from orc_release_hdp_2_6_5_99_1_tag_spark.sources.union_reader import read_orc_tagged

    rows = [
        (1, [datetime.datetime(2020, 1, 1, 12, 0, 0)], {"a": 1}),
        (2, [], {}),
        (3, None, None),
    ]
    df = spark.createDataFrame(
        rows, "id bigint, times array<timestamp>, m map<string,int>"
    )
    dest = str(tmp_path / "nested_ts")
    write_orc(df.repartition(1), dest)
    native = sorted(
        [r.asDict(recursive=True) for r in read_orc(spark, dest).collect()],
        key=lambda r: r["id"],
    )
    shim = sorted(
        [r.asDict(recursive=True) for r in read_orc_tagged(spark, dest).collect()],
        key=lambda r: r["id"],
    )
    assert shim == native


def test_typestress_roundtrip(spark, tmp_path):
    """timestamp 1900/2038 + DST boundary, decimal(38,18) edges, union
    tags with nulls (reference TestVectorOrcFile.java:1604,
    testDate1900/2038 golden files)."""
    schema = T.StructType(
        [
            T.StructField("time", T.TimestampType()),
            T.StructField("dec", T.DecimalType(38, 18)),
            T.StructField("tag", T.IntegerType()),
            T.StructField("u_int", T.IntegerType()),
            T.StructField("u_str", T.StringType()),
        ]
    )
    rows = [
        (datetime.datetime(1900, 1, 1, 0, 0, 0), Decimal("12345678901234567890.123456789012345678"), 0, 42, None),
        (datetime.datetime(2038, 1, 19, 3, 14, 7), Decimal("-0.000000000000000001"), 1, None, "s"),
        (datetime.datetime(2015, 3, 8, 2, 30, 0), Decimal("0"), 0, -1, None),
        (None, None, None, None, None),
    ]
    df = spark.createDataFrame(rows, schema).select(
        "time",
        "dec",
        union_encode(F.col("tag"), F.col("u_int"), F.col("u_str")).alias("union"),
    )
    dest = str(tmp_path / "typestress")
    write_orc(df.repartition(1), dest)
    back = read_orc(spark, dest)
    got = back.select(
        F.col("time").cast("string").alias("time_s"),
        F.col("dec").cast("string").alias("dec_s"),
        F.col("union._tag").alias("tag"),
        union_decode(F.col("union"), 0).alias("u0"),
        union_decode(F.col("union"), 1).alias("u1"),
    ).collect()
    as_set = {tuple(r) for r in got}
    assert ("1900-01-01 00:00:00", "12345678901234567890.123456789012345678", 0, 42, None) in as_set
    assert ("2038-01-19 03:14:07", "-0.000000000000000001", 1, None, "s") in as_set
    assert (None, None, None, None, None) in as_set
    # union invariant: exactly one variant non-null when tag present
    for time_s, dec_s, tag, u0, u1 in as_set:
        if tag == 0:
            assert u0 is not None and u1 is None
        if tag == 1:
            assert u1 is not None and u0 is None
