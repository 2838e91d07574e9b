"""I1/I2 capability demonstration (SURVEY §4 custom (d)): row-group
statistics skipping measurably reduces rows surfaced by the ORC scan,
and codecs trade size for speed. Uses executed-plan scan metrics."""

from __future__ import annotations

import glob
import os

import pyspark.sql.functions as F

from orc_release_hdp_2_6_5_99_1_tag_spark.plans.inspect import scan_output_rows
from orc_release_hdp_2_6_5_99_1_tag_spark.sources.orc_io import orc_copy, read_orc


def test_rowgroup_skipping_reduces_scan_output(spark, sf_dir):
    """On a key-sorted copy (disjoint row-group min/max ranges, the
    reference's orc_split_elim.orc layout) a point predicate must
    surface far fewer rows from the scan than the table holds —
    SARG row-group elimination at work (RecordReaderImpl.pickRowGroups).
    """
    path = orc_copy(
        spark, sf_dir, "lineitem", variant="bloom",
        bloom_filter_columns="l_orderkey", compression="snappy",
        sort_by=["l_orderkey", "l_linenumber"],
    )
    total = spark.read.orc(path).count()
    df = read_orc(spark, path).filter(F.col("l_orderkey") == 1000).select("l_orderkey")
    surfaced = scan_output_rows(df)
    assert surfaced >= 0
    # vectorized reader evaluates SARGs per row-group (10k rows): the
    # scan must surface at most a couple of row groups, not the table
    assert surfaced <= max(20_000, total // 10), (
        f"scan surfaced {surfaced} of {total} rows; row-group skipping not effective"
    )


def test_zorder_layout_skips_on_second_column(spark, tmp_path):
    """Z-order layout (zorder_write) must make row-group stats
    selective on the SECOND clustering column, where a lexicographic
    sort surfaces ~the whole table. 200k rows, two independent uniform
    dims, row groups of 1000: a 1/16-range predicate on `y` should
    scan a small multiple of the matching rows in the z-layout and
    ~everything in the x-sorted layout."""
    import pyspark.sql.functions as F

    from orc_release_hdp_2_6_5_99_1_tag_spark.sources.orc_io import write_orc, zorder_write

    df = (
        spark.range(200_000)
        .select(
            F.col("id"),
            (F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 4), 16, 10) % 1024)
            .cast("bigint")
            .alias("x"),
            (F.conv(F.substring(F.md5(F.concat(F.lit("y"), F.col("id").cast("string"))), 1, 4), 16, 10) % 1024)
            .cast("bigint")
            .alias("y"),
        )
    )
    lex = str(tmp_path / "lex")
    zed = str(tmp_path / "zed")
    write_orc(
        df.repartitionByRange(4, "x").sortWithinPartitions("x"),
        lex,
        compression="none",
        row_index_stride=1000,
    )
    zorder_write(
        df, zed, ["x", "y"], n_files=4, compression="none", row_index_stride=1000
    )
    pred = (F.col("y") >= 0) & (F.col("y") < 64)
    n_match = spark.read.orc(zed).filter(pred).count()
    assert n_match == spark.read.orc(lex).filter(pred).count()
    lex_surfaced = scan_output_rows(spark.read.orc(lex).filter(pred).select("y"))
    z_surfaced = scan_output_rows(spark.read.orc(zed).filter(pred).select("y"))
    # lexicographic layout can't skip on y at all; z-order must cut the
    # scan to well under half of it (ideally ~1/16 + row-group slop)
    assert z_surfaced < lex_surfaced / 2, (lex_surfaced, z_surfaced, n_match)


def test_zorder_edge_cases(spark, tmp_path):
    """zorder_write degrades cleanly: empty input writes as-is, many
    columns auto-cap bits to fit a signed long, and a non-numeric
    clustering column raises a clear error (not a py4j TypeError)."""
    import pytest
    from pyspark.sql import functions as F

    from orc_release_hdp_2_6_5_99_1_tag_spark.sources.orc_io import zorder_write

    df = spark.range(100).select(
        "id",
        *[(F.col("id") * (i + 3) % 97).alias(f"c{i}") for i in range(7)],
        F.lit("s").alias("label"),
    )
    empty = str(tmp_path / "empty")
    zorder_write(df.filter(F.lit(False)), empty, ["c0", "c1"])
    assert spark.read.orc(empty).count() == 0
    many = str(tmp_path / "many")  # 7 cols x default 10 bits would overflow
    zorder_write(df, many, [f"c{i}" for i in range(7)])
    assert spark.read.orc(many).count() == 100
    with pytest.raises(ValueError, match="label"):
        zorder_write(df, str(tmp_path / "bad"), ["c0", "label"])


def test_orc_v011_format_roundtrip(spark, sf_dir, tmp_path):
    """E1: `orc.write.format=0.11` (RLEv1-era files,
    `RunLengthIntegerWriter.java`) round-trips and stamps the file
    version."""
    from glob import glob

    from pyarrow import orc as pa_orc

    from orc_release_hdp_2_6_5_99_1_tag_spark.tables import load_table

    dest = str(tmp_path / "v011")
    n = load_table(spark, sf_dir, "nation")
    n.write.mode("overwrite").option("orc.write.format", "0.11").orc(dest)
    assert spark.read.orc(dest).count() == n.count()
    f = glob(dest + "/*.orc")[0]
    assert str(pa_orc.ORCFile(f).file_version) == "0.11"


def test_encoding_strategy_changes_file_size(spark, sf_dir, tmp_path):
    """E2: `orc.encoding.strategy=COMPRESSION` picks tighter integer
    encodings than SPEED (reference
    `RunLengthIntegerWriterV2.java:409-520` strategy switch); with the
    codec disabled the choice is visible as a file-size delta, and both
    files read back identically."""
    from orc_release_hdp_2_6_5_99_1_tag_spark.sources.orc_io import write_orc
    from orc_release_hdp_2_6_5_99_1_tag_spark.tables import load_table

    l = load_table(spark, sf_dir, "lineitem").repartition(1)
    sizes, counts = {}, {}
    for strat in ["SPEED", "COMPRESSION"]:
        dest = str(tmp_path / f"e2_{strat}")
        write_orc(l, dest, compression="none", encoding_strategy=strat)
        sizes[strat] = sum(
            os.path.getsize(f) for f in glob.glob(os.path.join(dest, "*.orc"))
        )
        counts[strat] = spark.read.orc(dest).count()
    assert counts["SPEED"] == counts["COMPRESSION"] == l.count()
    assert sizes["COMPRESSION"] < sizes["SPEED"], sizes


def test_dictionary_threshold_changes_file_size(spark, sf_dir, tmp_path):
    """E4: `orc.dictionary.key.threshold=0` disables dictionary
    encoding (reference `WriterImpl.checkDictionaryEncoding` /
    `StringRedBlackTree`); on low-cardinality string columns the
    dictionary-encoded file is measurably smaller, and both read back
    identically."""
    from orc_release_hdp_2_6_5_99_1_tag_spark.sources.orc_io import write_orc
    from orc_release_hdp_2_6_5_99_1_tag_spark.tables import load_table

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_orderpriority"
    ).repartition(1)
    sizes, counts = {}, {}
    for tag, thresh in [("dict", 0.8), ("nodict", 0.0)]:
        dest = str(tmp_path / f"e4_{tag}")
        write_orc(o, dest, compression="none", dictionary_key_threshold=thresh)
        sizes[tag] = sum(
            os.path.getsize(f) for f in glob.glob(os.path.join(dest, "*.orc"))
        )
        counts[tag] = spark.read.orc(dest).count()
    assert counts["dict"] == counts["nodict"] == o.count()
    assert sizes["dict"] < sizes["nodict"], sizes


def test_codec_sizes_ordered_sanely(spark, sf_dir):
    """zlib/zstd compress the sorted TPC-H-ish data better than NONE
    (E7); all codecs readable (e1 query checks value identity)."""
    sizes = {}
    for codec in ["none", "zlib", "zstd"]:
        path = orc_copy(spark, sf_dir, "orders", variant=f"codec_{codec}", compression=codec)
        sizes[codec] = sum(
            os.path.getsize(f) for f in glob.glob(os.path.join(path, "*.orc"))
        )
    assert sizes["zlib"] < sizes["none"], sizes
    assert sizes["zstd"] < sizes["none"], sizes
