"""The Arrow/numpy fast path for cosine top-k must agree with the
exact zip_with/aggregate baseline (v1): identical neighbor sets and
ranks, cosines equal to 1e-9 — anchoring the vectorized scale path to
the oracle-checked one."""

from __future__ import annotations

from orc_release_hdp_2_6_5_99_1_tag_spark.operators.similarity import (
    cosine_topk_vectorized,
    v1_cosine_topk,
)


def test_vectorized_matches_exact_baseline(spark, sf_dir):
    base = {
        (r.query_id, r.rank): (r.vec_id, float(r.cosine))
        for r in v1_cosine_topk(spark, sf_dir).collect()
    }
    fast = {
        (r.query_id, r.rank): (r.vec_id, r.cosine_raw)
        for r in cosine_topk_vectorized(spark, sf_dir).collect()
    }
    assert set(base) == set(fast)
    for k, (vec_id, cos) in base.items():
        f_vec, f_cos = fast[k]
        assert f_vec == vec_id, (k, vec_id, f_vec)
        assert abs(f_cos - cos) < 5e-5, (k, cos, f_cos)  # v1 cosine is %.4f-formatted
