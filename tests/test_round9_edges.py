"""Edge pins for the round-9 additions (x23 BM25, j5 VARIANT, u5
UDTF): the graded queries run over the null-free synthetic tables, so
the null/short-input semantics — which real 100 TB corpora WILL hit —
are pinned here on hostile in-memory rows."""

import pyspark.sql.functions as F
import pytest

from orc_release_hdp_2_6_5_99_1_tag_spark import get_spark


@pytest.fixture(scope="module")
def spark():
    return get_spark("round9-edges")


def test_variant_null_and_missing_path_semantics(spark):
    """to_json drops null struct fields by default, so a null source
    value surfaces as a MISSING variant path; try_variant_get returns
    NULL for missing paths, out-of-range array indexes, and
    uncastable types instead of failing the scan."""
    df = spark.createDataFrame(
        [(1, 10.0, '{"k": 7}'), (2, None, None), (3, 0.0, '{"k": null}')],
        "id bigint, value double, props string",
    )
    units = F.floor(F.col("value") * 100).cast("bigint")
    raw = F.to_json(
        F.struct(
            units.alias("units"),
            F.array(units).alias("metrics"),
            F.get_json_object("props", "$.k").cast("bigint").alias("k"),
        )
    )
    v = df.select("id", F.parse_json(raw).alias("v"))
    rows = {
        r["id"]: r
        for r in v.select(
            "id",
            F.try_variant_get("v", "$.units", "bigint").alias("units"),
            F.try_variant_get("v", "$.k", "bigint").alias("k"),
            F.try_variant_get("v", "$.metrics[5]", "bigint").alias("oob"),
            F.try_variant_get("v", "$.units", "array<int>").alias("badcast"),
            F.schema_of_variant("v").alias("sch"),
        ).collect()
    }
    assert rows[1]["units"] == 1000 and rows[1]["k"] == 7
    # null value -> to_json drops the field -> missing path -> NULL
    assert rows[2]["units"] is None and rows[2]["k"] is None
    # JSON null k extracts as NULL, units present
    assert rows[3]["units"] == 0 and rows[3]["k"] is None
    # out-of-range index and impossible cast are NULL, never an error
    assert all(r["oob"] is None and r["badcast"] is None for r in rows.values())
    # the dropped field narrows the per-row variant schema
    assert "units" in rows[1]["sch"] and "units" not in rows[2]["sch"]


def test_udtf_short_empty_and_null_docs(spark):
    """u5's window emitter on hostile inputs: a doc shorter than one
    window yields exactly one partial window; whitespace-only and NULL
    docs yield zero rows (LATERAL drops them, no null row)."""
    from orc_release_hdp_2_6_5_99_1_tag_spark.operators.extras import (
        u5_python_udtf,
    )

    # running the operator registers `u5_token_windows` in this session
    u5_python_udtf(spark, "/root/testdata/sf0.001")
    spark.createDataFrame(
        [(1, "only four tokens here"), (2, "   "), (3, None), (4, "x " * 40)],
        "doc_id bigint, text string",
    ).createOrReplaceTempView("u5_edge_docs")
    xt_df = spark.sql(
        """
        SELECT d.doc_id, w.win_idx, w.n_tokens, w.start_tok, w.first_tok
        FROM u5_edge_docs d, LATERAL u5_token_windows(d.text) w
        ORDER BY d.doc_id, w.win_idx
        """
    )
    rows = xt_df.collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1: 4 tokens -> one window of 4
    assert [(r["win_idx"], r["n_tokens"]) for r in by_doc[1]] == [(0, 4)]
    # whitespace-only: ''.split() == [] -> no windows; NULL -> no rows
    assert 2 not in by_doc and 3 not in by_doc
    # doc 4: 40 tokens -> full window at 0, then the 24-token tail
    # window at 16 (the overlap), and the emitter stops there
    assert [(r["win_idx"], r["start_tok"], r["n_tokens"]) for r in by_doc[4]] == [
        (0, 0, 32),
        (1, 16, 24),
    ]


def test_bm25_unknown_term_and_score_monotonicity(spark):
    """BM25 sanity on the real corpus: a doc matching MORE query terms
    outranks a doc matching fewer (idf positive under the +1 variant),
    and the n_terms_hit column never exceeds the query's vocab size."""
    from orc_release_hdp_2_6_5_99_1_tag_spark.operators.text import (
        _BM25_QUERIES,
        x23_bm25_topk,
    )

    out = x23_bm25_topk(spark, "/root/testdata/sf0.001").collect()
    assert out, "top-k must be non-empty on the synthetic corpus"
    vocab = {qid: len(set(q.split())) for qid, q in _BM25_QUERIES}
    for r in out:
        assert 1 <= r["n_terms_hit"] <= vocab[r["query_id"]]
        assert r["score_ppm"] > 0
    # within a query, rank order follows the quantized score
    from collections import defaultdict

    per_q = defaultdict(list)
    for r in sorted(out, key=lambda r: (r["query_id"], r["rk"])):
        per_q[r["query_id"]].append(r["score_ppm"])
    for scores in per_q.values():
        assert scores == sorted(scores, reverse=True)
