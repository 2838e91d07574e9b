"""orc_data/orc_scan tool equivalents + bucketed co-located joins
(the at-scale shuffle-elimination pattern SURVEY §4 calls out)."""

from __future__ import annotations

import json

import pyspark.sql.functions as F

from orc_release_hdp_2_6_5_99_1_tag_spark.plans.inspect import formatted_plan
from orc_release_hdp_2_6_5_99_1_tag_spark.sources.orc_io import orc_copy
from orc_release_hdp_2_6_5_99_1_tag_spark.sources.tools import orc_data, orc_scan
from orc_release_hdp_2_6_5_99_1_tag_spark.tables import load_table


def test_orc_copy_target_file_rows(spark, sf_dir):
    """target_file_rows sizes the output (~n/target files) while the
    sorted variant keeps disjoint key ranges per file — the 100 TB
    file-count knob."""
    import glob
    import math
    import os

    path = orc_copy(
        spark, sf_dir, "orders", variant="sized",
        target_file_rows=5000, sort_by=["o_orderkey"],
    )
    n = spark.read.orc(path).count()
    files = glob.glob(os.path.join(path, "*.orc"))
    assert len(files) == max(1, math.ceil(n / 5000))


def test_orc_data_json_dump(spark, sf_dir):
    path = orc_copy(spark, sf_dir, "nation")
    rows = orc_data(spark, path, limit=5).collect()
    assert len(rows) == 5
    parsed = json.loads(rows[0].json)
    assert set(parsed) == {"n_nationkey", "n_name", "n_regionkey"}


def test_orc_scan_counts(spark, sf_dir):
    path = orc_copy(spark, sf_dir, "nation")
    assert orc_scan(spark, path).collect()[0].rows == load_table(spark, sf_dir, "nation").count()


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    """Both sides bucketed+sorted on the join key -> sort-merge join
    with zero Exchange (the pre-partitioned co-located join the
    reference's MR shuffle types S8 approximate)."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    import shutil

    spark.sql("DROP TABLE IF EXISTS li_bkt")
    spark.sql("DROP TABLE IF EXISTS ord_bkt")
    # in-memory catalog forgets tables between sessions but the
    # warehouse dirs persist; clear them or saveAsTable refuses
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("li_bkt", "ord_bkt"):
        shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)
    (
        l.write.mode("overwrite").format("orc")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("li_bkt")
    )
    (
        o.write.mode("overwrite").format("orc")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("ord_bkt")
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = (
            spark.table("li_bkt")
            .join(spark.table("ord_bkt"), F.col("l_orderkey") == F.col("o_orderkey"))
            .agg(F.count(F.lit(1)).alias("n"))
        )
        j.collect()
        plan = formatted_plan(j)
        assert "SortMergeJoin" in plan
        # bucket co-location: no shuffle-by-key anywhere (the final
        # count's SinglePartition exchange is expected and allowed)
        assert "Exchange hashpartitioning" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_catalog_contract_sanity(spark):
    """Driver-contract invariants: every oracle has a query; names are
    unique and well-formed."""
    from orc_release_hdp_2_6_5_99_1_tag_spark import catalog

    qs, osql = catalog.queries(), catalog.oracle_sql()
    assert set(osql) <= set(qs)
    assert all(isinstance(s, str) and "SELECT" in s.upper() for s in osql.values())
    missing_oracle = sorted(set(qs) - set(osql))
    # only genuinely non-SQL-expressible ops may omit oracles
    assert missing_oracle == [], f"queries without oracle: {missing_oracle}"

def test_orc_memory_estimate(spark, tmp_path):
    """`orc-memory` analog (reference tools/src/FileMemory.cc role):
    the estimate's data component must cover the decoder's REAL fetch
    accounting for the worst stripe, decompression buffers appear only
    for compressed files, and the estimate is monotone in the column
    set."""
    import glob as g

    import pyspark.sql.functions as F

    from orc_release_hdp_2_6_5_99_1_tag_spark.sources import stream_decode as sd
    from orc_release_hdp_2_6_5_99_1_tag_spark.sources.tools import orc_memory

    df = (
        spark.range(20000)
        .select(
            "id",
            F.md5(F.col("id").cast("string")).alias("s"),
            (F.col("id") % 1000).cast("int").alias("v"),
        )
        .orderBy("id")
    )
    for codec in ("zlib", "none"):
        out = str(tmp_path / f"mem_{codec}")
        (
            df.coalesce(1).write.mode("overwrite")
            .option("compression", codec)
            .option("orc.row.index.stride", "1000")
            .orc(out)
        )
        path = sorted(g.glob(out + "/*.orc"))[0]
        full = orc_memory(path)
        one = orc_memory(path, columns=["id"])
        assert one["total"] <= full["total"]
        assert one["data"] < full["data"]
        assert full["tail"] > 0
        if codec == "none":
            assert full["decompression"] == 0
        else:
            assert full["decompression"] > 0
        # data component covers the decoder's real whole-stripe fetch
        res = sd.decode_stripe(
            path, full["stripe"], ("between", "id", [-1, 10**9]),
            ["id", "s", "v"],
        )
        assert res["bytes_fetched"] <= full["data"]


def test_orc_writer_timezones_goldens():
    """timezone-dump analog (S12's sixth CLI): the per-stripe
    writerTimezone + the offsets the rebase consumes, pinned against
    the non-UTC golden the union decode already pins (US/Pacific,
    -08:00 standard at both the 2015 base and the epoch) and a
    v0.11 file with no writerTimezone field (absent -> UTC)."""
    from orc_release_hdp_2_6_5_99_1_tag_spark.sources.tools import (
        orc_writer_timezones,
    )

    ex = "/root/reference/examples"
    pac, v11 = orc_writer_timezones(
        [f"{ex}/TestOrcFile.testUnionAndTimestamp.orc",
         f"{ex}/orc-file-11-format.orc"]
    )
    assert len(pac["stripes"]) >= 1
    for st in pac["stripes"]:
        assert st["writer_timezone"] == "US/Pacific"
        assert st["offset_at_base_s"] == -8 * 3600
        assert st["offset_at_epoch_s"] == -8 * 3600
        assert st["dst_at_base"] is False
        # base_timestamp = toEpoch(2015-01-01 wall, writer zone):
        # the UTC base shifted by the zone's offset
        assert st["base_timestamp_s"] == 1420070400 - st["offset_at_base_s"]
    for st in v11["stripes"]:
        assert st["writer_timezone"] == "UTC"
        assert st["offset_at_base_s"] == 0
        assert st["base_timestamp_s"] == 1420070400
