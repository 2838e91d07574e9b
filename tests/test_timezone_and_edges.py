"""Timestamp/timezone hazards (SURVEY watch list: ORC
writer-timezone semantics, reference `TestOrcTimezone1-3`,
`TreeReaderFactory.java:866-1028`) and writer edge cases."""

from __future__ import annotations

import pyspark.sql.functions as F

from orc_release_hdp_2_6_5_99_1_tag_spark.sources.orc_io import read_orc, write_orc


def test_orc_timestamp_instant_stable_across_session_tz(spark, tmp_path):
    """An ORC-written timestamp represents the same instant regardless
    of the reader's session timezone (the engine pins UTC; this
    verifies nothing is double-converted if a reader doesn't)."""
    dest = str(tmp_path / "tz")
    df = spark.sql(
        "SELECT TIMESTAMP '2024-03-10 02:30:00' AS ts"  # US DST gap hour
    )
    write_orc(df, dest)
    micros_utc = read_orc(spark, dest).select(F.unix_micros("ts")).collect()[0][0]
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
    try:
        micros_la = read_orc(spark, dest).select(F.unix_micros("ts")).collect()[0][0]
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    assert micros_utc == micros_la, "instant must not shift with reader session tz"


def test_empty_dataframe_orc_roundtrip(spark, tmp_path):
    """Zero-row write preserves schema on read (reference
    `zero.orc` golden file case)."""
    dest = str(tmp_path / "empty")
    df = spark.range(0).select(
        F.col("id").alias("k"), F.lit("x").alias("s"), F.lit(1.5).alias("d")
    )
    write_orc(df, dest)
    back = read_orc(spark, dest)
    assert back.count() == 0
    assert [f.name for f in back.schema] == ["k", "s", "d"]


def test_wide_table_roundtrip(spark, tmp_path):
    """300-column write/read (reference `TestOrcWideTable` strategy)."""
    dest = str(tmp_path / "wide")
    cols = [F.lit(i).alias(f"c{i}") for i in range(300)]
    df = spark.range(10).select(*cols)
    write_orc(df, dest)
    back = read_orc(spark, dest)
    assert len(back.columns) == 300
    row = back.collect()[0]
    assert row["c0"] == 0 and row["c299"] == 299


def test_timestamp_ppd_exact_and_effective_across_session_tz(spark, tmp_path):
    """The reference's timestamp-PPD hazard (F11 / TestOrcTimezonePPD):
    row-group timestamp stats must neither skip wrongly nor shift
    meaning when the READER session timezone differs from the writer's.
    A fixed-INSTANT predicate (timestamp_micros literal — timezone
    independent, unlike a parsed string literal) must select the same
    rows under UTC / Los_Angeles / Tokyo sessions, and the scan must
    still skip row groups (stats not poisoned by the TZ change)."""
    import pyspark.sql.functions as F

    from orc_release_hdp_2_6_5_99_1_tag_spark.plans.inspect import scan_output_rows
    from orc_release_hdp_2_6_5_99_1_tag_spark.sources.orc_io import read_orc, write_orc

    n, stride = 3000, 1000
    df = spark.range(n).select(
        "id", F.timestamp_micros(F.col("id") * 3_600_000_000).alias("ts")
    )
    path = str(tmp_path / "tz_ppd")
    write_orc(df.coalesce(1), path, row_index_stride=stride)

    target = 1_500 * 3_600_000_000  # an instant inside the second row-group block
    prev = spark.conf.get("spark.sql.session.timeZone")
    results, surfaced = {}, {}
    try:
        for tz in ("UTC", "America/Los_Angeles", "Asia/Tokyo"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            q = read_orc(spark, path).filter(
                F.col("ts") == F.timestamp_micros(F.lit(target))
            ).select("id")
            results[tz] = sorted(r["id"] for r in q.collect())
            surfaced[tz] = scan_output_rows(q)
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)

    assert results["UTC"] == [1500]
    assert results["America/Los_Angeles"] == results["UTC"] == results["Asia/Tokyo"]
    # skipping stays effective in every session TZ: at most one
    # row-group block surfaces, never the whole file
    for tz, rows in surfaced.items():
        assert rows <= stride, (tz, rows)
