"""MinHash-LSH quality: every high-similarity pair found by the exact
token-join ground truth must be recalled by the LSH pipeline (16
perms / 4×4 bands ⇒ miss probability ≈ (1-s^4)^4, ≈ 2.6e-6 at
s=0.96 — deterministic here since the hash family is fixed)."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_lsh_recalls_high_similarity_pairs(spark, sf_dir):
    from orc_release_hdp_2_6_5_99_1_tag_spark.operators.dedup import (
        _shingles,
        d2_minhash_lsh,
    )
    from orc_release_hdp_2_6_5_99_1_tag_spark.tables import load_table

    d = load_table(spark, sf_dir, "documents")
    sh = _shingles(d).select("doc_id", "s")
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.toDF("doc_a", "s")
    b = sh.toDF("doc_b", "s2")
    inter = (
        a.join(b, (F.col("s") == F.col("s2")) & (F.col("doc_a") < F.col("doc_b")))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    exact = (
        inter.join(sizes.toDF("doc_a", "na"), "doc_a")
        .join(sizes.toDF("doc_b", "nb"), "doc_b")
        .withColumn("j", F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")))
        .filter(F.col("j") >= 0.95)
        .select("doc_a", "doc_b")
    )
    truth = {(r.doc_a, r.doc_b) for r in exact.collect()}
    found = {(r.doc_a, r.doc_b) for r in d2_minhash_lsh(spark, sf_dir).collect()}
    assert truth, "corpus should contain planted near-duplicates"
    missed = truth - found
    assert not missed, f"LSH missed high-similarity pairs: {sorted(missed)[:5]}"


def test_d10_transitive_chain_forms_one_cluster(spark):
    """A~B and B~C must land in ONE cluster with survivor min(doc_id),
    even when A and C themselves are below the pair threshold — the
    exact property pair listings (d2) cannot express. The chain is
    built from a long shared core with small disjoint edits so adjacent
    docs clear Jaccard>=0.8 while the endpoints may not."""
    from orc_release_hdp_2_6_5_99_1_tag_spark.operators.dedup import (
        verified_dup_pairs,
    )
    import orc_release_hdp_2_6_5_99_1_tag_spark.operators.dedup as dd

    core = " ".join(f"w{i}" for i in range(60))
    rows = [
        (1, core + " alpha beta", "web-1"),
        (2, core + " alpha gamma", "web-1"),   # ~1: share core+alpha
        (3, core + " delta gamma", "web-2"),   # ~2: share core+gamma
        (10, "совершенно другой текст " * 20, "web-3"),  # unrelated
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string, source string")

    pairs = {(r.doc_a, r.doc_b) for r in verified_dup_pairs(d).collect()}
    assert (1, 2) in pairs and (2, 3) in pairs

    got = {
        (r.doc_id, r.cluster_id, r.is_survivor)
        for r in dd.dup_clusters(d).collect()
    }
    assert got == {(1, 1, 1), (2, 1, 0), (3, 1, 0)}, got


def test_connected_components_long_path_beats_round_cap(spark):
    """A path-shaped component of diameter 60 — min-label propagation
    needs 60 rounds (> _CC_MAX_ROUNDS = 25) and would return split
    clusters; large-star/small-star must converge inside the cap and
    label every node with the path's minimum."""
    from orc_release_hdp_2_6_5_99_1_tag_spark.operators.dedup import (
        _CC_MAX_ROUNDS,
        connected_components,
    )

    n = 61  # edges (i, i+1): diameter 60 > the round cap
    assert n - 1 > _CC_MAX_ROUNDS
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)] + [(1000, 1001)],
        "doc_a long, doc_b long",
    )
    expected = {(i, 0) for i in range(n)} | {(1000, 1000), (1001, 1000)}
    # distributed star loop (threshold 0 forces the big-graph path)
    got = {
        (r.doc_id, r.lab)
        for r in connected_components(pairs, driver_cc_max_edges=0).collect()
    }
    assert got == expected
    # driver union-find fast path (default threshold) — same labels
    got_uf = {(r.doc_id, r.lab) for r in connected_components(pairs).collect()}
    assert got_uf == expected


def test_d18_containment_detects_planted_quote(spark, tmp_path):
    """A short doc fully quoted inside a long one: Jaccard is tiny
    (union is the long doc) but containment(A→B) must be 1.0 and the
    reverse direction must NOT clear the threshold — the asymmetry is
    the operator's reason to exist."""
    from orc_release_hdp_2_6_5_99_1_tag_spark.operators.dedup import d18_containment

    big_words = [f"tok{i}" for i in range(120)]
    quote = " ".join(big_words[40:70])      # 30-token span inside big
    big = " ".join(big_words)
    rows = [
        (1, quote, "en", "srcA", len(quote)),
        (2, big, "en", "srcB", len(big)),
        (3, "completely different text entirely here now", "en", "srcC", 44),
    ]
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {
        (r["contained_doc"], r["container_doc"]): r["containment"]
        for r in d18_containment(spark, str(tmp_path)).collect()
    }
    assert out.get((1, 2)) == 1.0, f"planted quote not detected: {out}"
    assert (2, 1) not in out, "reverse direction should not clear the threshold"
    assert not any(3 in k for k in out), "unrelated doc produced a pair"


def test_d19_scrubs_planted_banner_within_source_only(spark, tmp_path):
    """A 5-token banner planted at the head of every srcA page must be
    identified as boilerplate and removed from ALL srcA docs — but the
    identical banner appearing once in srcB must survive (the decision
    is per-source), and the char accounting must be exact single-space
    re-join arithmetic."""
    from orc_release_hdp_2_6_5_99_1_tag_spark.operators.dedup import (
        d19_boilerplate_scrub,
    )

    banner = "accept all cookies to continue"  # 5 tokens = one chunk
    bodies = [
        "alpha bravo charlie delta echo foxtrot golf hotel india juliett",
        "kilo lima mike november oscar papa quebec romeo sierra tango",
    ]
    rows = [
        (1, f"{banner} {bodies[0]}", "en", "srcA", 0),
        (2, f"{banner} {bodies[1]}", "en", "srcA", 0),
        (3, f"{banner} {bodies[0]}", "en", "srcB", 0),  # lone occurrence
    ]
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {r["source"]: r.asDict() for r in d19_boilerplate_scrub(spark, str(tmp_path)).collect()}

    a = out["srcA"]
    assert a["boiler_chunks"] == 1 and a["occurrences_removed"] == 2
    assert a["n_docs_scrubbed"] == 2
    # exact char math: banner chunk (30 chars) + joining space drop out
    assert a["chars_before"] - a["chars_after"] == 2 * (len(banner) + 1)
    assert a["chars_before"] == sum(len(f"{banner} {b}") for b in bodies)

    b = out["srcB"]
    assert b["boiler_chunks"] == 0 and b["occurrences_removed"] == 0
    assert b["chars_after"] == b["chars_before"] == len(f"{banner} {bodies[0]}")
