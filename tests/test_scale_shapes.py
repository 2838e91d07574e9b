"""Skew stress for the two-phase operator shapes: on a 2M-row corpus
where ONE domain holds ~70% of all rows, the salted/bucketed forms
(`domain_cap_kept`, `pack_start_offsets`) must produce exactly the
naive single-window semantics — the form the oracles use — while never
materializing a corpus-sized window partition (plan-asserted by
construction: the global windows see only survivors / bucket sums)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

N_ROWS = 2_000_000


def _skewed_corpus(spark):
    """(doc_id, source, n_tok): source 'hot' holds ~70% of rows, the
    rest spread over 20 tail domains; n_tok deterministic in doc_id."""
    return spark.range(N_ROWS).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 10 < 7, F.lit("hot"))
        .otherwise(F.concat(F.lit("tail"), (F.col("id") % 20).cast("string")))
        .alias("source"),
        (F.col("id") % 97 + 1).cast("bigint").alias("n_tok"),
    )


def test_domain_cap_matches_naive_window_under_skew(spark):
    from orc_release_hdp_2_6_5_99_1_tag_spark.operators.dedup import domain_cap_kept

    d = _skewed_corpus(spark)
    two_phase = domain_cap_kept(d, cap=20, salt_buckets=8)
    w = Window.partitionBy("source").orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
    naive = (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
        .select("doc_id", "source")
    )
    assert two_phase.exceptAll(naive).count() == 0
    assert naive.exceptAll(two_phase).count() == 0
    # domains: 'hot' + tail{7,8,9,17,18,19} (id%10>=7 constrains id%20)
    assert two_phase.count() == 7 * 20


def test_pack_offsets_match_naive_cumsum_under_skew(spark):
    from orc_release_hdp_2_6_5_99_1_tag_spark.operators.text import pack_start_offsets

    d = _skewed_corpus(spark)
    two_phase = pack_start_offsets(d).select("doc_id", "start")
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    naive = d.select(
        "doc_id", F.coalesce(F.sum("n_tok").over(w), F.lit(0)).alias("start")
    )
    assert two_phase.exceptAll(naive).count() == 0
    assert naive.exceptAll(two_phase).count() == 0


def test_interval_join_blocking_matches_naive_range_join(spark):
    """w6's bucket-blocked equi-join must equal the naive theta-join
    semantics on a skewed synthetic stream (one user owns ~half the
    events, intervals straddle bucket boundaries)."""
    from orc_release_hdp_2_6_5_99_1_tag_spark.operators import temporal as tp

    n = 200_000
    bucket_us = 3_600_000_000
    ev = spark.range(n).select(
        F.col("id").alias("event_id"),
        F.when(F.col("id") % 2 == 0, F.lit(7)).otherwise(F.col("id") % 50).alias("user_id"),
        # irregular spacing so intervals cross hour boundaries unpredictably
        (F.col("id") * 97_003_117 % (72 * bucket_us)).alias("us"),
        F.when(F.col("id") % 3 == 0, F.lit("purchase")).otherwise(F.lit("click")).alias("event_type"),
        (F.col("id") % 1000).cast("double").alias("value"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_event_id"),
        "user_id",
        F.col("us").alias("start_us"),
        (F.col("us") + bucket_us).alias("end_us"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("us").alias("c_us"), F.col("value").alias("c_value")
    )
    naive = (
        p.join(
            c,
            (p["user_id"] == c["user_id"])
            & F.col("c_us").between(F.col("start_us"), F.col("end_us")),
        )
        .groupBy("purchase_event_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("c_value").alias("s"))
    )
    p_blocked = p.withColumn(
        "bucket",
        F.explode(
            F.array_distinct(
                F.array(
                    F.floor(F.col("start_us") / bucket_us),
                    F.floor(F.col("end_us") / bucket_us),
                )
            )
        ),
    )
    cb = c.withColumn("bucket", F.floor(F.col("c_us") / bucket_us))
    blocked = (
        p_blocked.join(cb, ["user_id", "bucket"])
        .filter(F.col("c_us").between(F.col("start_us"), F.col("end_us")))
        .groupBy("purchase_event_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("c_value").alias("s"))
    )
    a = {r["purchase_event_id"]: (r["n"], r["s"]) for r in blocked.collect()}
    b = {r["purchase_event_id"]: (r["n"], r["s"]) for r in naive.collect()}
    assert a == b and len(a) > 1000


def test_aqe_splits_skewed_join_partitions(spark):
    """AQE's OptimizeSkewedJoin must fire on a hot-key join — the
    Spark-native complement to j3's manual salting: one synthetic key
    owns ~90% of the fact side, and with skew thresholds lowered to
    toy scale the executed plan must mark the sort-merge join
    `skew=true` (the hot partition is split into parallel subtasks
    instead of serializing one reducer). At 100 TB this is the
    difference between a 5-minute join and one straggler running for
    hours; the session-default AQE confs enable it everywhere."""
    import pyspark.sql.functions as F

    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        fact = spark.range(200_000).select(
            F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id")).alias("k"),
            (F.col("id") * 17 % 1000).alias("v"),
            F.concat(F.lit("pad-"), F.col("id").cast("string")).alias("pad"),
        )
        dim = spark.range(200_000).select(
            F.col("id").alias("k"), (F.col("id") % 5).alias("grp")
        )
        j = fact.join(dim, "k").groupBy("grp").agg(F.count(F.lit(1)).alias("n"))
        rows = {r["grp"]: r["n"] for r in j.collect()}
        # correctness: key 7 carries 180k fact rows into grp 2
        assert rows[2] >= 180_000
        executed = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in executed, (
            f"OptimizeSkewedJoin did not fire:\n{executed[:2000]}"
        )
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
