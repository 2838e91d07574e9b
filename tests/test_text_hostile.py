"""Oracle-parity of the round-3 text operators on hostile corpora:
NULL text, empty text, whitespace-only, unicode spaces, and single-token
documents — the places where Spark's `\\s+` split and DuckDB's
string_split_regex could disagree."""

from __future__ import annotations

import os

import pytest

from tests.oracle_utils import compare_query, duckdb_con

ROWS = [
    (0, "one", "en", "src0", 3),                      # single token
    (1, "two tokens", "en", "src0", 10),
    (2, "", "en", "src1", 0),                          # empty
    (3, "   ", "en", "src1", 3),                       # whitespace only
    (4, "tabs\tand\nnewlines here", "de", "src1", 22),
    (5, "nbsp joined stays one-ish", "es", "src2", 25),  # NBSP not ASCII ws
    (6, "x " * 100, "zh", "src2", 200),                # long + trailing space
    (7, "MIXED case Repeat repeat REPEAT", "en", "src2", 31),
    (8, None, "en", "src3", 0),                        # NULL text
]


@pytest.fixture(scope="module")
def hostile_sf(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    sf = str(tmp_path_factory.mktemp("hostile") / "sfh")
    os.makedirs(sf, exist_ok=True)
    table = pa.table(
        {
            "doc_id": pa.array([r[0] for r in ROWS], pa.int64()),
            "text": pa.array([r[1] for r in ROWS], pa.string()),
            "lang": pa.array([r[2] for r in ROWS], pa.string()),
            "source": pa.array([r[3] for r in ROWS], pa.string()),
            "n_chars": pa.array([r[4] for r in ROWS], pa.int64()),
        }
    )
    pq.write_table(table, os.path.join(sf, "documents.parquet"))
    return sf


@pytest.mark.parametrize("name", ["x11", "x12", "x13", "x14"])
def test_text_op_on_hostile_corpus(spark, hostile_sf, name):
    from orc_release_hdp_2_6_5_99_1_tag_spark.operators import text as tx

    fn, sql = {
        "x11": (tx.x11_doc_chunking, tx.X11_ORACLE),
        "x12": (tx.x12_token_freq_quality, tx.X12_ORACLE),
        "x13": (tx.x13_tfidf_topk, tx.X13_ORACLE),
        "x14": (tx.x14_dataset_card, tx.X14_ORACLE),
    }[name]
    con = duckdb_con(hostile_sf)
    try:
        compare_query(fn(spark, hostile_sf), con, sql)
    finally:
        con.close()


def test_x20_vocab_growth_invariants(spark, sf_dir):
    """The growth curve's defining facts: cumulative vocabulary is
    strictly monotone, its final value equals the corpus's exact
    distinct-token count, and each decile's new-token count is the
    cumulative delta."""
    import pyspark.sql.functions as F

    from orc_release_hdp_2_6_5_99_1_tag_spark.operators.text import x20_vocab_growth
    from orc_release_hdp_2_6_5_99_1_tag_spark.tables import load_table

    rows = sorted(
        x20_vocab_growth(spark, sf_dir).collect(), key=lambda r: r["decile"]
    )
    assert rows
    prev = 0
    for r in rows:
        assert r["new_tokens"] >= 1
        assert r["cumulative_vocab"] == prev + r["new_tokens"]
        prev = r["cumulative_vocab"]
    d = load_table(spark, sf_dir, "documents")
    total_vocab = (
        d.select(F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("w"))
        .filter(F.col("w") != "")
        .select("w")
        .distinct()
        .count()
    )
    assert prev == total_vocab
