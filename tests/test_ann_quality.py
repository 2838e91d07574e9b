"""ANN recall quality: the approximate similarity paths (v2 sign-LSH,
v3 IVF, v4 PQ) are graded against oracles that REPLAY the same
approximation — which proves determinism, not usefulness. These tests
measure the part that makes them worth running: recall against the
exact brute-force ground truth on the live corpus, with deterministic
bounds (fixed data, fixed hash family, no RNG anywhere).
"""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from orc_release_hdp_2_6_5_99_1_tag_spark.tables import load_table


def _ground_truth(spark, sf_dir, n_queries: int, k: int, skip_self: bool = False):
    """Exact cosine top-k per query via numpy (independent of every
    Spark path under test)."""
    rows = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    ids = np.array([r["vec_id"] for r in rows])
    x = np.array([r["embedding"] for r in rows], dtype=np.float64)
    order = np.argsort(ids)
    ids, x = ids[order], x[order]
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    truth = {}
    for q in range(n_queries):
        sims = xn @ xn[q]
        cand = np.argsort(-sims, kind="stable")
        picked = []
        for j in cand:
            if skip_self and ids[j] == q:
                continue
            picked.append(int(ids[j]))
            if len(picked) == k:
                break
        truth[q] = picked
    return truth


def test_v3_ivf_recall_vs_exact(spark, sf_dir):
    """IVF with nprobe=4 of 16 lists scans ~1/4 of the corpus; on this
    corpus it must recover at least 2/3 of the exact top-3 neighbors
    averaged over the 5 queries (deterministic — fixed centroids)."""
    from orc_release_hdp_2_6_5_99_1_tag_spark.operators.similarity import (
        _N_QUERIES,
        _TOP_K,
        v3_ivf_ann,
    )

    truth = _ground_truth(spark, sf_dir, _N_QUERIES, _TOP_K, skip_self=True)
    got: dict[int, list[int]] = {}
    for r in v3_ivf_ann(spark, sf_dir).collect():
        got.setdefault(r["query_id"], []).append(r["vec_id"])
    hits = sum(len(set(got.get(q, [])) & set(t)) for q, t in truth.items())
    total = sum(len(t) for t in truth.values())
    recall = hits / total
    assert recall >= 2 / 3, f"IVF recall collapsed: {recall:.2f} ({hits}/{total})"


def test_v4_pq_recall_vs_exact(spark, sf_dir):
    """PQ serving is ADC cell-probe + exact cosine rerank (round 6,
    the FAISS IVFADC+R shape): the lossiness is now all in WHICH cells
    are probed, never in the ranking of probed candidates. Invariants:
    every query's own vector (its own cell is ADC rank 1, cosine 1 to
    itself) must rank FIRST, and recall@5 vs exact cosine must clear
    the pre-rerank floor (measured 0.40 ADC-only; rerank lifts the
    unclustered corpus too because within-cell vec_id tie-breaks are
    replaced by exact ordering)."""
    from orc_release_hdp_2_6_5_99_1_tag_spark.operators.similarity import (
        _PQ_NQ,
        _PQ_TOPK,
        v4_pq_ann,
    )

    rows = v4_pq_ann(spark, sf_dir).collect()
    got: dict[int, list[int]] = {}
    for r in sorted(rows, key=lambda r: (r["query_id"], r["rank"])):
        got.setdefault(r["query_id"], []).append(r["vec_id"])
    # exact cosine ground truth (the rerank metric)
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in e])
    x = np.array([r["embedding"] for r in e], dtype=np.float64)
    order = np.argsort(ids)
    ids, x = ids[order], x[order]
    nrm = np.sqrt((x * x).sum(1))
    hits = total = 0
    for q in range(_PQ_NQ):
        cos = (x @ x[q]) / (nrm * nrm[q])
        exact = [int(ids[j]) for j in np.argsort(-cos, kind="stable")[:_PQ_TOPK]]
        assert got[q][0] == q, f"query {q}'s own vector not ranked first: {got[q]}"
        hits += len(set(got[q]) & set(exact))
        total += _PQ_TOPK
    recall = hits / total
    assert recall >= 0.4, f"PQ recall collapsed: {recall:.2f} ({hits}/{total})"


def test_v2_lsh_neighbor_quality(spark, sf_dir):
    """Multi-probe sign-LSH returns each query's best neighbor within
    the PROBE SET (own bucket + the 8 one-bit-flip buckets); the
    invariant is that the returned neighbor is the TRUE cosine argmax
    over the probed buckets — the approximation loses candidates
    beyond Hamming distance 1, it never mis-ranks the ones it keeps."""
    from orc_release_hdp_2_6_5_99_1_tag_spark.operators.similarity import (
        _LSH_BITS,
        _sign_bucket,
        v2_lsh_bucketed_ann,
    )

    e = load_table(spark, sf_dir, "embeddings")
    buckets = {
        r["vec_id"]: r["b"]
        for r in e.select("vec_id", _sign_bucket(F.col("embedding")).alias("b")).collect()
    }
    vecs = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in e.select("vec_id", "embedding").collect()
    }

    def cos(a, b):
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    out = v2_lsh_bucketed_ann(spark, sf_dir).collect()
    assert out, "every query shares its probe set with at least one corpus vector"
    for r in out:
        q, nb = r["query_id"], r["vec_id"]
        probe_set = {buckets[q]} | {buckets[q] ^ (1 << i) for i in range(_LSH_BITS)}
        assert buckets[nb] == r["bucket"] and r["bucket"] in probe_set
        true_cos = cos(vecs[q], vecs[nb])
        # argmax within the probed buckets
        best = max(
            (cos(vecs[q], v) for vid, v in vecs.items()
             if vid != q and buckets[vid] in probe_set),
        )
        assert abs(true_cos - best) < 1e-9, (
            f"v2 did not return the probed-argmax for query {q}"
        )


def test_v5_int8_recall_vs_exact(spark, sf_dir):
    """int8 scalar quantization is near-lossless on unit-scale
    embeddings: the quantized top-3 per query must agree with the
    exact float top-3 on the overwhelming majority of slots."""
    from orc_release_hdp_2_6_5_99_1_tag_spark.operators.similarity import (
        v1_cosine_topk,
        v5_scalar_quantized_topk,
    )

    exact = {
        (r["query_id"], r["rank"]): r["vec_id"]
        for r in v1_cosine_topk(spark, sf_dir).collect()
    }
    quant = {
        (r["query_id"], r["rank"]): r["vec_id"]
        for r in v5_scalar_quantized_topk(spark, sf_dir).collect()
    }
    keys = [k for k in exact if k in quant]
    assert keys, "no overlapping (query, rank) slots"
    hits = sum(1 for k in keys if exact[k] == quant[k])
    assert hits / len(keys) >= 0.8, f"int8 recall collapsed: {hits}/{len(keys)}"


def test_v6_two_tier_recall_vs_exact(spark, sf_dir):
    """The truncated-dim prefilter must keep the true top-3 in its 40
    candidates for most slots (two-tier recall)."""
    from orc_release_hdp_2_6_5_99_1_tag_spark.operators.similarity import (
        v1_cosine_topk,
        v6_two_tier_rerank,
    )

    exact = {
        (r["query_id"], r["rank"]): r["vec_id"]
        for r in v1_cosine_topk(spark, sf_dir).collect()
    }
    two = {
        (r["query_id"], r["rank"]): r["vec_id"]
        for r in v6_two_tier_rerank(spark, sf_dir).collect()
    }
    keys = [k for k in exact if k in two]
    assert keys
    hits = sum(1 for k in keys if exact[k] == two[k])
    # rank-1 is the query itself (cosine 1 in both tiers) — must never lose it
    self_slots = [k for k in keys if k[1] == 1]
    assert all(exact[k] == two[k] for k in self_slots)
    # untrained isotropic embeddings: the prefix carries only part of
    # the signal, so the honest bar is "far better than random
    # candidate selection", not near-perfect recall (MRL-trained
    # embeddings are engineered to make tier 1 near-lossless)
    from orc_release_hdp_2_6_5_99_1_tag_spark.operators.similarity import _TT_CAND
    from orc_release_hdp_2_6_5_99_1_tag_spark.tables import load_table

    n = load_table(spark, sf_dir, "embeddings").count()
    random_recall = min(1.0, _TT_CAND / n)
    got = hits / len(keys)
    assert got >= max(0.3, 3 * random_recall), (
        f"two-tier recall {got:.2f} does not beat random baseline {random_recall:.3f}"
    )
