"""All-null column behavior — the reference's
`TestOrcNullOptimization.java` family: a column that is entirely null
writes a suppressed data stream (file barely grows), its footer stats
say hasNull with zero values, and IS NULL / IS NOT NULL predicates
stay exact through the scan.
"""

from __future__ import annotations

import glob
import os

import pyspark.sql.functions as F
import pytest

from orc_release_hdp_2_6_5_99_1_tag_spark.sources.footer_tail import parse_tail_of_file
from orc_release_hdp_2_6_5_99_1_tag_spark.sources.orc_io import read_orc, write_orc

_N = 10_000


@pytest.fixture(scope="module")
def null_orc(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("nullopt")
    allnull = spark.range(_N).select(
        "id",
        F.lit(None).cast("bigint").alias("all_null"),
        (F.col("id") * 3).alias("dense"),
    )
    populated = spark.range(_N).select(
        "id",
        # same schema, fully populated with RLE-hostile values so the
        # column's data stream has real bytes (a delta-friendly
        # sequence would encode to ~nothing and mask the suppression)
        F.hash(F.col("id").cast("string")).cast("bigint").alias("all_null"),
        (F.col("id") * 3).alias("dense"),
    )
    p_null, p_pop = str(base / "allnull"), str(base / "populated")
    write_orc(allnull.coalesce(1), p_null, compression="none")
    write_orc(populated.coalesce(1), p_pop, compression="none")
    return p_null, p_pop


def test_allnull_roundtrip_and_predicates(spark, null_orc):
    p_null, _ = null_orc
    df = read_orc(spark, p_null)
    assert df.filter(F.col("all_null").isNull()).count() == _N
    assert df.filter(F.col("all_null").isNotNull()).count() == 0
    assert df.filter(F.col("all_null") == 5).count() == 0  # eq never matches null
    r = df.filter(F.col("id") == 17).collect()[0]
    assert r["all_null"] is None and r["dense"] == 51


def test_allnull_footer_stats(spark, null_orc):
    p_null, _ = null_orc
    f = glob.glob(f"{p_null}/*.orc")[0]
    cols = {c["name"]: c for c in parse_tail_of_file(f)["columns"]}
    assert cols["all_null"]["has_null"] is True
    assert cols["all_null"]["n_values"] == 0  # n_values counts non-nulls
    assert cols["dense"]["has_null"] is False
    assert cols["dense"]["n_values"] == _N


def test_allnull_stream_is_suppressed(spark, null_orc):
    """Null suppression: the all-null file must be much smaller than
    the identically-schemaed populated file — the column's data stream
    is not materialized (present-bitmap only)."""
    p_null, p_pop = null_orc
    sz = lambda p: sum(os.path.getsize(f) for f in glob.glob(f"{p}/*.orc"))  # noqa: E731
    assert sz(p_null) * 1.2 < sz(p_pop), (sz(p_null), sz(p_pop))
