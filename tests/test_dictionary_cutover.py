"""Dictionary-cutover parity (reference `TestStringDictionary.java`,
`WriterImpl.checkDictionaryEncoding:1228-1239`, `OrcConf.java:93-105`):
the writer keeps a string column dictionary-encoded only while
distinct/total <= `orc.dictionary.key.threshold` (default 0.8); above
the threshold it cuts over to DIRECT_V2. The A6 advisor *predicts*
that decision from the distinct ratio — this family asserts the
encoding ACTUALLY CHOSEN in written files (via the pure-Python
stripe-footer parser) agrees with the prediction, and that the
threshold knob steers the writer."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from orc_release_hdp_2_6_5_99_1_tag_spark.sources.footer_tail import (
    parse_stripe_footers,
)

# exactly ONE index stride (orc.row.index.stride default 10000): the
# reference's early check (`orc.dictionary.early.check`, default true)
# evaluates the cutover at the FIRST stride boundary, so the family
# keeps the stride-local distinct ratio identical to the global one —
# otherwise a column that is 0.7-distinct overall but all-distinct in
# its first 10k rows is (correctly) cut over to DIRECT_V2.
_N = 10_000


def _write_orc(spark, df, path: str) -> str:
    df.coalesce(1).write.mode("overwrite").orc(path)
    part = [x for x in os.listdir(path) if x.endswith(".orc")][0]
    return os.path.join(path, part)


@pytest.fixture(scope="module")
def card_df(spark):
    """One string column per cardinality regime: far below the 0.8
    threshold (3 distinct), just below (0.7), just above (0.9), and
    all-unique (1.0)."""
    return spark.range(_N).select(
        (F.col("id") % 3).cast("string").alias("lo3"),
        (F.col("id") % int(_N * 0.7)).cast("string").alias("ratio_07"),
        (F.col("id") % int(_N * 0.9)).cast("string").alias("ratio_09"),
        F.concat(F.lit("u"), F.col("id").cast("string")).alias("unique"),
    )


def _encodings(spark, df, tmp_path, name: str) -> list[dict]:
    f = _write_orc(spark, df, str(tmp_path / name))
    stripes = parse_stripe_footers(f)
    assert stripes, "no stripes parsed"
    # single coalesced writer task, data fits one stripe at these sizes
    return stripes[0]["encodings"]


def test_cutover_follows_default_threshold(spark, card_df, tmp_path):
    """At the default 0.8 threshold the writer dictionary-encodes the
    0.0015/0.7-ratio columns and cuts over to DIRECT_V2 for the
    0.9/1.0-ratio columns — the exact decision boundary
    TestStringDictionary pins in the reference."""
    enc = _encodings(spark, card_df, tmp_path, "default")
    # column ids: 0 = root struct, then schema order
    by_name = dict(zip(["lo3", "ratio_07", "ratio_09", "unique"], enc[1:]))
    assert by_name["lo3"]["kind"] == "DICTIONARY_V2"
    assert by_name["lo3"]["dictionary_size"] == 3
    assert by_name["ratio_07"]["kind"] == "DICTIONARY_V2"
    assert by_name["ratio_07"]["dictionary_size"] == int(_N * 0.7)
    assert by_name["ratio_09"]["kind"] == "DIRECT_V2"
    assert by_name["unique"]["kind"] == "DIRECT_V2"


def test_threshold_zero_disables_dictionary(spark, card_df, tmp_path):
    """orc.dictionary.key.threshold=0 forces DIRECT_V2 everywhere —
    the cutover knob reaches Spark's ORC writer through the Hadoop
    conf (the reference reads it via OrcConf.DICTIONARY_KEY_SIZE_
    THRESHOLD)."""
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    hconf.set("orc.dictionary.key.threshold", "0")
    try:
        enc = _encodings(spark, card_df, tmp_path, "thresh0")
    finally:
        hconf.unset("orc.dictionary.key.threshold")
    for name, e in zip(["lo3", "ratio_07", "ratio_09", "unique"], enc[1:]):
        assert e["kind"] == "DIRECT_V2", f"{name} still dictionary at threshold 0"
        assert e["dictionary_size"] == 0


def test_threshold_one_keeps_dictionary_everywhere(spark, card_df, tmp_path):
    """threshold=1.0 never cuts over — even the all-unique column
    stays DICTIONARY_V2 (dictionary_size == row count), matching the
    reference's inclusive `<=` comparison."""
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    hconf.set("orc.dictionary.key.threshold", "1.0")
    try:
        enc = _encodings(spark, card_df, tmp_path, "thresh1")
    finally:
        hconf.unset("orc.dictionary.key.threshold")
    by_name = dict(zip(["lo3", "ratio_07", "ratio_09", "unique"], enc[1:]))
    for name in ["lo3", "ratio_07", "ratio_09", "unique"]:
        assert by_name[name]["kind"] == "DICTIONARY_V2", name
    assert by_name["unique"]["dictionary_size"] == _N


def test_advisor_prediction_matches_written_encoding(spark, card_df, tmp_path):
    """A6's decision rule (distinct/total <= 0.8 → dictionary) applied
    to the same columns must agree with the encoding the writer chose,
    column by column — the advisor is a *predictor* of the write-side
    cutover, not a separate heuristic."""
    enc = _encodings(spark, card_df, tmp_path, "advisor")
    cols = ["lo3", "ratio_07", "ratio_09", "unique"]
    ratios = card_df.agg(
        *[
            (F.count_distinct(F.col(c)) / F.count(F.col(c))).alias(c)
            for c in cols
        ]
    ).collect()[0]
    for c, e in zip(cols, enc[1:]):
        predicted = ratios[c] <= 0.8
        actual = e["kind"] == "DICTIONARY_V2"
        assert predicted == actual, (
            f"{c}: advisor predicts dictionary={predicted} "
            f"(ratio {ratios[c]:.3f}) but writer chose {e['kind']}"
        )


def test_early_check_decides_on_first_stride(spark, tmp_path):
    """`orc.dictionary.early.check` (default true) evaluates the
    cutover at the FIRST index-stride boundary: a column that is
    all-distinct in its first 10k rows is cut over to DIRECT_V2 even
    when later rows would pull the global ratio under the threshold
    (here ~0.5) — the reference's memory-safety rationale: don't keep
    building a dictionary that is already provably useless."""
    df = spark.range(20_000).select(
        F.when(F.col("id") < 10_000, F.col("id").cast("string"))
        .otherwise(F.lit("x"))
        .alias("front_loaded")
    )
    f = _write_orc(spark, df, str(tmp_path / "earlycheck"))
    enc = parse_stripe_footers(f)[0]["encodings"]
    assert enc[1]["kind"] == "DIRECT_V2", (
        "early check should have cut over on the all-distinct first stride"
    )


def test_non_string_columns_never_dictionary(spark, tmp_path):
    """Numeric columns use RLE (DIRECT_V2) regardless of cardinality —
    ORC dictionary encoding is a string-family feature
    (WriterImpl routes int writers to RLE unconditionally)."""
    df = spark.range(_N).select(
        (F.col("id") % 3).alias("lo_int"),
        F.col("id").alias("hi_int"),
    )
    f = _write_orc(spark, df, str(tmp_path / "ints"))
    enc = parse_stripe_footers(f)[0]["encodings"]
    for e in enc[1:]:
        assert e["kind"] == "DIRECT_V2"
        assert e["dictionary_size"] == 0


def test_multi_stripe_encodings_parse_per_stripe(spark, tmp_path):
    """Small orc.stripe.size forces several stripes in one file; the
    parser must return one encoding list per stripe (the cutover is a
    per-stripe decision in the reference — early.check semantics),
    and a stable column's encoding must agree across stripes."""
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    hconf.set("orc.stripe.size", str(64 * 1024))
    try:
        df = spark.range(200_000).select(
            (F.col("id") % 5).cast("string").alias("lo"),
            F.concat(F.lit("u"), F.col("id").cast("string")).alias("hi"),
        )
        f = _write_orc(spark, df, str(tmp_path / "multistripe"))
    finally:
        hconf.unset("orc.stripe.size")
    stripes = parse_stripe_footers(f)
    assert len(stripes) >= 2, f"expected multiple stripes, got {len(stripes)}"
    assert sum(s["numberOfRows"] for s in stripes) == 200_000
    for s in stripes:
        assert s["encodings"][1]["kind"] == "DICTIONARY_V2"
        assert s["encodings"][1]["dictionary_size"] == 5
        assert s["encodings"][2]["kind"] == "DIRECT_V2"
