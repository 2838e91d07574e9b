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
