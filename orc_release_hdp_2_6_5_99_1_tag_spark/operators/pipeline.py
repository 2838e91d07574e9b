"""End-to-end training-data preparation pipeline (SURVEY §2.13
capstone): the five stages a real corpus run chains — language filter,
quality gate, exact dedup, benchmark decontamination, deterministic
train/val/test split — composed as ONE declarative DataFrame plan, so
Catalyst sees the whole pipeline (filters merge into the scan;
projection pruning crosses stage boundaries; nothing materializes
between stages).

The stage expressions are shared with the standalone operators
(`dedup.normalized_fp_col` / `dedup.ngram_shingle_col` /
`text.split_label_col`, each with its SQL twin), so a threshold or
n-gram change in one place updates both the standalone query and the
pipeline, engine and oracle alike.

Scale notes per stage: the language/quality filters are scan-time
predicates (pushed to the parquet/ORC reader); exact dedup is one
shuffle on the md5 fingerprint; decontamination shingle-explodes ONLY
the eval set (tiny, broadcast) and the surviving deduped docs — never
the discarded part of the corpus — and checks membership via a
broadcast semi-join. Total cost at 100 TB: the corpus scan (plus the
cheap eval-subset re-scan), one fingerprint shuffle, and broadcast
joins — no corpus-sized exchange after the fingerprint one.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from orc_release_hdp_2_6_5_99_1_tag_spark.operators.dedup import (
    SQL_NORMALIZED_FP,
    ngram_shingle_col,
    normalized_fp_col,
    sql_ngram_shingles,
)
from orc_release_hdp_2_6_5_99_1_tag_spark.operators.text import (
    SQL_SPLIT_BUCKET,
    SQL_SPLIT_LABEL,
    split_label_col,
)
from orc_release_hdp_2_6_5_99_1_tag_spark.tables import load_table

_MIN_CHARS = 150
_NGRAM = 8
_EVAL_MOD = 97


def pipe1_training_data_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """English docs ≥150 chars, exact-deduped (canonical = min doc_id
    per normalized fingerprint), decontaminated against the doc_id%97
    eval set's 8-grams, split 98/1/1 by md5 bucket; per-split counts
    and checksums."""
    d = load_table(spark, sf_dir, "documents")
    # stage 1+2: language + quality gate (scan-time predicates)
    base = d.filter((F.col("lang") == "en") & (F.col("n_chars") >= _MIN_CHARS))
    # stage 3: exact dedup — keep the min doc_id per fingerprint
    with_fp = base.withColumn("fp", normalized_fp_col())
    canon = with_fp.groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
    deduped = with_fp.join(canon, ["fp", "doc_id"], "left_semi")
    # stage 4: decontamination — eval 8-grams from the full corpus's
    # eval subset; the corpus side shingles ONLY the surviving docs
    # (contamination of already-discarded docs is irrelevant)
    def shingled(df: DataFrame) -> DataFrame:
        toks = df.select("doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("t"))
        return toks.select("doc_id", F.explode(ngram_shingle_col(_NGRAM)).alias("s"))

    eval_sh = shingled(d.filter(F.col("doc_id") % _EVAL_MOD == 0)).select("s").distinct()
    contaminated = (
        shingled(deduped)
        .join(F.broadcast(eval_sh), "s", "left_semi")
        .select("doc_id")
        .distinct()
    )
    clean = deduped.join(F.broadcast(contaminated), "doc_id", "left_anti")
    # stage 5: deterministic split
    return (
        clean.select("doc_id", "n_chars", split_label_col().alias("split"))
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("chars_total"),
            F.sum("doc_id").alias("id_checksum"),
        )
        .orderBy("split")
    )


PIPE1_ORACLE = f"""
WITH base AS (
  SELECT doc_id, text, n_chars FROM documents
  WHERE lang = 'en' AND n_chars >= {_MIN_CHARS}
), with_fp AS (
  SELECT doc_id, n_chars, {SQL_NORMALIZED_FP} AS fp
  FROM base
), canon AS (
  SELECT fp, MIN(doc_id) AS doc_id FROM with_fp GROUP BY fp
), deduped AS (
  SELECT w.doc_id, w.n_chars FROM with_fp w SEMI JOIN canon c
    ON w.fp = c.fp AND w.doc_id = c.doc_id
), t AS MATERIALIZED (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS l FROM documents
), sh AS ({sql_ngram_shingles(_NGRAM)}
), eval_sh AS (
  SELECT DISTINCT s FROM sh WHERE doc_id % {_EVAL_MOD} = 0
), contaminated AS (
  SELECT DISTINCT doc_id FROM sh SEMI JOIN eval_sh USING (s)
), clean AS (
  SELECT d.doc_id, d.n_chars FROM deduped d ANTI JOIN contaminated c USING (doc_id)
), labeled AS (
  SELECT doc_id, n_chars, {SQL_SPLIT_BUCKET} AS b
  FROM clean
)
SELECT {SQL_SPLIT_LABEL} AS split,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS chars_total,
       CAST(SUM(doc_id) AS BIGINT) AS id_checksum
FROM labeled GROUP BY 1 ORDER BY split
"""


def pipe2_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation-funnel report: the per-stage retention table every
    dataset card publishes (docs in → language filter → quality gate →
    exact dedup → decontamination), with doc counts, char volume, and
    an id checksum per stage. Stage semantics are EXACTLY pipe1's —
    the funnel is the observability view over the same pipeline.

    Spark-first shape: every stage becomes a per-doc boolean flag in
    one pass (the dedup flag via a doc_id-keyed semi-join with the
    canonical set, the contamination flag via the same broadcast sets
    pipe1 uses), then ONE explode over a 5-element stage array turns
    flags into funnel rows — a single scan of the flagged frame, 5×
    row growth (bounded), one tiny groupBy(stage). No per-stage
    re-scans of the corpus.
    """
    d = load_table(spark, sf_dir, "documents")
    lang_ok = F.col("lang") == "en"
    qual_ok = lang_ok & (F.col("n_chars") >= _MIN_CHARS)

    with_fp = d.filter(qual_ok).withColumn("fp", normalized_fp_col())
    canon_ids = (
        with_fp.groupBy("fp").agg(F.min("doc_id").alias("doc_id")).select("doc_id")
    )

    def shingled(df: DataFrame) -> DataFrame:
        toks = df.select("doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("t"))
        return toks.select("doc_id", F.explode(ngram_shingle_col(_NGRAM)).alias("s"))

    eval_sh = shingled(d.filter(F.col("doc_id") % _EVAL_MOD == 0)).select("s").distinct()
    deduped = with_fp.join(canon_ids, "doc_id", "left_semi")
    contaminated = (
        shingled(deduped)
        .join(F.broadcast(eval_sh), "s", "left_semi")
        .select("doc_id")
        .distinct()
    )
    flags = (
        d.join(canon_ids.withColumn("is_canon", F.lit(True)), "doc_id", "left")
        .join(contaminated.withColumn("is_contam", F.lit(True)), "doc_id", "left")
        .select(
            "doc_id",
            "n_chars",
            lang_ok.alias("f1"),
            qual_ok.alias("f2"),
            (qual_ok & F.coalesce("is_canon", F.lit(False))).alias("f3"),
            (
                qual_ok
                & F.coalesce("is_canon", F.lit(False))
                & ~F.coalesce("is_contam", F.lit(False))
            ).alias("f4"),
        )
    )
    stages = F.array(
        F.struct(F.lit("0_total").alias("stage"), F.lit(True).alias("ok")),
        F.struct(F.lit("1_lang").alias("stage"), F.col("f1").alias("ok")),
        F.struct(F.lit("2_quality").alias("stage"), F.col("f2").alias("ok")),
        F.struct(F.lit("3_dedup").alias("stage"), F.col("f3").alias("ok")),
        F.struct(F.lit("4_decontam").alias("stage"), F.col("f4").alias("ok")),
    )
    return (
        flags.select("doc_id", "n_chars", F.explode(stages).alias("st"))
        .filter(F.col("st.ok"))
        .groupBy(F.col("st.stage").alias("stage"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("chars_total"),
            F.sum("doc_id").alias("id_checksum"),
        )
        .orderBy("stage")
    )


PIPE2_ORACLE = f"""
WITH with_fp AS (
  SELECT doc_id, n_chars, {SQL_NORMALIZED_FP} AS fp
  FROM documents WHERE lang = 'en' AND n_chars >= {_MIN_CHARS}
), canon AS (
  SELECT MIN(doc_id) AS doc_id FROM with_fp GROUP BY fp
), t AS MATERIALIZED (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS l FROM documents
), sh AS ({sql_ngram_shingles(_NGRAM)}
), eval_sh AS (
  SELECT DISTINCT s FROM sh WHERE doc_id % {_EVAL_MOD} = 0
), contaminated AS (
  SELECT DISTINCT doc_id FROM sh SEMI JOIN eval_sh USING (s)
  WHERE doc_id IN (SELECT doc_id FROM canon)
), flags AS (
  SELECT d.doc_id, d.n_chars,
         (d.lang = 'en') AS f1,
         (d.lang = 'en' AND d.n_chars >= {_MIN_CHARS}) AS f2,
         (d.doc_id IN (SELECT doc_id FROM canon)) AS f3,
         (d.doc_id IN (SELECT doc_id FROM canon)
          AND d.doc_id NOT IN (SELECT doc_id FROM contaminated)) AS f4
  FROM documents d
), funnel AS (
  SELECT '0_total' AS stage, doc_id, n_chars FROM flags
  UNION ALL SELECT '1_lang', doc_id, n_chars FROM flags WHERE f1
  UNION ALL SELECT '2_quality', doc_id, n_chars FROM flags WHERE f2
  UNION ALL SELECT '3_dedup', doc_id, n_chars FROM flags WHERE f3
  UNION ALL SELECT '4_decontam', doc_id, n_chars FROM flags WHERE f4
)
SELECT stage, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS chars_total,
       CAST(SUM(doc_id) AS BIGINT) AS id_checksum
FROM funnel GROUP BY stage ORDER BY stage
"""


# ---------------------------------------------------------------------------
# pipe3: segment-level funnel (w12's window chain × w13's RFM banding)
# ---------------------------------------------------------------------------


def pipe3_segment_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capstone: conversion funnel BY customer segment — the query a
    growth team actually runs. Composes the w12 chained-conditional-
    window funnel with the w13 fixed-threshold RFM banding in ONE
    Catalyst plan: both halves aggregate on user_id, so the whole
    pipeline is one events scan, one user_id exchange reused by the
    window chain and both rollups, then a 27-group summary.

    Per segment: users, view->click and click->purchase conversion
    rates (rounded), and total purchase spend — the segment-funnel
    mart row.
    """
    from pyspark.sql import Window

    from orc_release_hdp_2_6_5_99_1_tag_spark.operators.temporal import (
        _RFM_ANCHOR,
        _RFM_F_CUTS,
        _RFM_M_CUTS,
        _RFM_R_DAYS,
    )

    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "value", F.col("ts"), F.unix_micros("ts").alias("us")
    )
    wu = Window.partitionBy("user_id")
    x = e.withColumn(
        "t1", F.min(F.when(F.col("event_type") == "view", F.col("us"))).over(wu)
    )
    x = x.withColumn(
        "t2",
        F.min(
            F.when(
                (F.col("event_type") == "click") & (F.col("us") > F.col("t1")),
                F.col("us"),
            )
        ).over(wu),
    )
    x = x.withColumn(
        "t3",
        F.min(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("us") > F.col("t2")),
                F.col("us"),
            )
        ).over(wu),
    )
    is_p = F.col("event_type") == "purchase"
    u = x.groupBy("user_id").agg(
        F.min("t1").alias("t1"),
        F.min("t2").alias("t2"),
        F.min("t3").alias("t3"),
        F.max(F.when(is_p, F.col("ts").cast("date"))).alias("last_p"),
        F.count(F.when(is_p, F.lit(1))).alias("freq"),
        # exact decimal accumulation (see w13): no double-sum banding
        F.coalesce(
            F.sum(F.when(is_p, F.col("value").cast("decimal(18,2)"))),
            F.lit(0).cast("decimal(18,2)"),
        )
        .cast("double")
        .alias("mon"),
    )
    rec = F.datediff(F.lit(_RFM_ANCHOR).cast("date"), F.col("last_p"))
    seg = F.concat(
        F.when(rec.isNull(), "R3")
        .when(rec <= _RFM_R_DAYS[0], "R1")
        .when(rec <= _RFM_R_DAYS[1], "R2")
        .otherwise("R3"),
        F.when(F.col("freq") >= _RFM_F_CUTS[0], "F1")
        .when(F.col("freq") >= _RFM_F_CUTS[1], "F2")
        .otherwise("F3"),
        F.when(F.col("mon") >= _RFM_M_CUTS[0], "M1")
        .when(F.col("mon") >= _RFM_M_CUTS[1], "M2")
        .otherwise("M3"),
    )
    return (
        u.select("user_id", "mon", "t1", "t2", "t3", seg.alias("segment"))
        .groupBy("segment")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.count("t1").alias("n_view"),
            F.count("t2").alias("n_click"),
            F.count("t3").alias("n_purchase"),
            F.round(F.count("t2") / F.count("t1"), 6).alias("view_to_click"),
            F.round(F.count("t3") / F.count("t2"), 6).alias("click_to_purchase"),
            F.sum(F.col("mon").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_spend"),
        )
        .orderBy("segment")
    )


def _pipe3_oracle() -> str:
    from orc_release_hdp_2_6_5_99_1_tag_spark.operators.temporal import (
        _RFM_ANCHOR,
        _RFM_F_CUTS,
        _RFM_M_CUTS,
        _RFM_R_DAYS,
    )

    return f"""
WITH e AS (
  SELECT user_id, event_type, value, CAST(ts AS DATE) AS d, epoch_us(ts) AS us, ts
  FROM events
), w1 AS (
  SELECT *, MIN(CASE WHEN event_type = 'view' THEN us END)
              OVER (PARTITION BY user_id) AS t1 FROM e
), w2 AS (
  SELECT *, MIN(CASE WHEN event_type = 'click' AND us > t1 THEN us END)
              OVER (PARTITION BY user_id) AS t2 FROM w1
), w3 AS (
  SELECT *, MIN(CASE WHEN event_type = 'purchase' AND us > t2 THEN us END)
              OVER (PARTITION BY user_id) AS t3 FROM w2
), u AS (
  SELECT user_id, MIN(t1) AS t1, MIN(t2) AS t2, MIN(t3) AS t3,
         MAX(CASE WHEN event_type = 'purchase' THEN d END) AS last_p,
         COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS freq,
         CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase'
                            THEN CAST(value AS DECIMAL(18,2)) END),
                       0) AS DOUBLE) AS mon
  FROM w3 GROUP BY user_id
), seg AS (
  SELECT user_id, mon, t1, t2, t3,
         concat(
           CASE WHEN last_p IS NULL THEN 'R3'
                WHEN date_diff('day', last_p, DATE '{_RFM_ANCHOR}') <= {_RFM_R_DAYS[0]} THEN 'R1'
                WHEN date_diff('day', last_p, DATE '{_RFM_ANCHOR}') <= {_RFM_R_DAYS[1]} THEN 'R2'
                ELSE 'R3' END,
           CASE WHEN freq >= {_RFM_F_CUTS[0]} THEN 'F1'
                WHEN freq >= {_RFM_F_CUTS[1]} THEN 'F2'
                ELSE 'F3' END,
           CASE WHEN mon >= {_RFM_M_CUTS[0]} THEN 'M1'
                WHEN mon >= {_RFM_M_CUTS[1]} THEN 'M2'
                ELSE 'M3' END) AS segment
  FROM u
)
SELECT segment, COUNT(*) AS n_users,
       COUNT(t1) AS n_view, COUNT(t2) AS n_click, COUNT(t3) AS n_purchase,
       ROUND(COUNT(t2) / CAST(COUNT(t1) AS DOUBLE), 6) AS view_to_click,
       ROUND(COUNT(t3) / CAST(COUNT(t2) AS DOUBLE), 6) AS click_to_purchase,
       CAST(SUM(CAST(mon AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
FROM seg GROUP BY segment ORDER BY segment
"""


PIPE3_ORACLE = _pipe3_oracle()


_P4_ANCHORS = 8
_P4_NEGS = 3
_P4_MIN_TOKENS = 10


def pipe4_contrastive_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capstone composing the round-9 surfaces into the training-data
    product they exist for: CONTRASTIVE TRAINING PAIRS with a
    text-quality gate. documents ⋈ embeddings (doc_id = vec_id), drop
    candidates under a minimum token count (quality gates run BEFORE
    expensive similarity work — the pipe1 lesson), then per anchor
    emit the top-1 same-label positive and top-3 hardest
    different-label negatives with the text-side features a trainer
    exports (token count, text fingerprint prefix).

    Scale: one documents scan (token counting inline with the join
    projection), one broadcast(anchors) × gated-corpus scored pass —
    the v8 shape with the gate fused upstream so ungated vectors never
    reach the cosine; no shuffle grows with corpus size except the
    gated join itself."""
    from orc_release_hdp_2_6_5_99_1_tag_spark.operators.similarity import (
        _cosine,
        _norm,
    )
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("n_tokens"),
        F.substring(F.md5(F.col("text")), 1, 8).alias("fp8"),
    )
    emb = load_table(spark, sf_dir, "embeddings")
    corpus = (
        emb.join(docs, emb["vec_id"] == docs["doc_id"])
        .filter(F.col("n_tokens") >= _P4_MIN_TOKENS)
        .select(
            "vec_id",
            "label",
            "embedding",
            "n_tokens",
            "fp8",
            _norm(F.col("embedding")).alias("c_norm"),
        )
    )
    q = corpus.filter(F.col("vec_id") < _P4_ANCHORS).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("label").alias("anchor_label"),
        F.col("embedding").alias("q_emb"),
        F.col("c_norm").alias("q_norm"),
    )
    scored = (
        F.broadcast(q)
        .crossJoin(corpus)
        .filter(F.col("vec_id") != F.col("anchor_id"))
        .select(
            "anchor_id",
            F.when(F.col("label") == F.col("anchor_label"), F.lit("pos"))
            .otherwise(F.lit("neg"))
            .alias("kind"),
            "vec_id",
            "label",
            "n_tokens",
            "fp8",
            _cosine(
                F.col("q_emb"), F.col("embedding"), F.col("q_norm"), F.col("c_norm")
            ).alias("cosine_raw"),
        )
    )
    w = Window.partitionBy("anchor_id", "kind").orderBy(
        F.desc("cosine_raw"), F.asc("vec_id")
    )
    keep = F.when(F.col("kind") == "pos", 1).otherwise(F.lit(_P4_NEGS))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= keep)
        .select(
            "anchor_id",
            "kind",
            "rk",
            F.col("vec_id").alias("cand_id"),
            F.col("label").alias("cand_label"),
            F.col("n_tokens").alias("cand_tokens"),
            F.col("fp8").alias("cand_fp8"),
            F.format_string("%.4f", F.col("cosine_raw")).alias("cosine"),
        )
        .orderBy("anchor_id", "kind", "rk")
    )


PIPE4_ORACLE = f"""
WITH docs AS (
  SELECT doc_id,
         len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
         substr(md5(text), 1, 8) AS fp8
  FROM documents
), corpus AS (
  SELECT e.vec_id, e.label, e.embedding, d.n_tokens, d.fp8
  FROM embeddings e JOIN docs d ON e.vec_id = d.doc_id
  WHERE d.n_tokens >= {_P4_MIN_TOKENS}
), q AS (
  SELECT vec_id AS anchor_id, label AS anchor_label, embedding AS q_emb
  FROM corpus WHERE vec_id < {_P4_ANCHORS}
), scored AS (
  SELECT q.anchor_id,
         CASE WHEN c.label = q.anchor_label THEN 'pos' ELSE 'neg' END AS kind,
         c.vec_id AS cand_id, c.label AS cand_label,
         c.n_tokens AS cand_tokens, c.fp8 AS cand_fp8,
         list_cosine_similarity(CAST(q.q_emb AS DOUBLE[]),
                                CAST(c.embedding AS DOUBLE[])) AS cosine_raw
  FROM q JOIN corpus c ON c.vec_id <> q.anchor_id
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY anchor_id, kind ORDER BY cosine_raw DESC, cand_id ASC) AS rk
  FROM scored
)
SELECT anchor_id, kind, CAST(rk AS INT) AS rk, cand_id, cand_label,
       CAST(cand_tokens AS INT) AS cand_tokens, cand_fp8,
       printf('%.4f', cosine_raw) AS cosine
FROM ranked
WHERE rk <= CASE WHEN kind = 'pos' THEN 1 ELSE {_P4_NEGS} END
ORDER BY anchor_id, kind, rk
"""
