"""End-to-end training-data preparation pipeline (SURVEY §2.13
capstone): the five stages a real corpus run chains — language filter,
quality gate, exact dedup, benchmark decontamination, deterministic
train/val/test split — composed as ONE declarative DataFrame plan, so
Catalyst sees the whole pipeline (filters merge into the scan;
projection pruning crosses stage boundaries; nothing materializes
between stages).

Scale notes per stage: the language/quality filters are scan-time
predicates (pushed to the parquet/ORC reader); exact dedup is one
shuffle on the md5 fingerprint; decontamination broadcasts the tiny
eval-set shingle table (same shape as `dedup.d7_decontaminate`); the
split is a stateless md5-bucket map. Total cost at 100 TB: one scan +
one fingerprint shuffle + one broadcast semi-join — no stage-to-stage
checkpoint unless the operator is reused downstream.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

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
    fp = F.md5(F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")))
    with_fp = base.withColumn("fp", fp)
    canon = with_fp.groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
    deduped = with_fp.join(canon, ["fp", "doc_id"], "left_semi")
    # stage 4: decontamination — eval 8-grams from the FULL corpus
    toks = d.select("doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("t"))
    sh = toks.select(
        "doc_id",
        F.explode(
            F.when(
                F.size("t") >= _NGRAM,
                F.expr(
                    f"transform(sequence(0, size(t)-{_NGRAM}), i -> concat_ws(' ', slice(t, i+1, {_NGRAM})))"
                ),
            ).otherwise(F.array())
        ).alias("s"),
    )
    eval_sh = sh.filter(F.col("doc_id") % _EVAL_MOD == 0).select("s").distinct()
    contaminated = (
        sh.join(F.broadcast(eval_sh), "s", "left_semi").select("doc_id").distinct()
    )
    clean = deduped.join(F.broadcast(contaminated), "doc_id", "left_anti")
    # stage 5: deterministic split
    bucket = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10).cast(
        "bigint"
    ) % 100
    split = (
        F.when(bucket < 98, F.lit("train"))
        .when(bucket < 99, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        clean.select("doc_id", "n_chars", split.alias("split"))
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
  SELECT doc_id, n_chars,
         md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
  FROM base
), canon AS (
  SELECT fp, MIN(doc_id) AS doc_id FROM with_fp GROUP BY fp
), deduped AS (
  SELECT w.doc_id, w.n_chars FROM with_fp w SEMI JOIN canon c
    ON w.fp = c.fp AND w.doc_id = c.doc_id
), t AS MATERIALIZED (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS l FROM documents
), sh AS (
  SELECT doc_id, array_to_string(l[i:i+{_NGRAM - 1}], ' ') AS s
  FROM t, unnest(range(1, len(l) - {_NGRAM - 2})) AS u(i)
  WHERE len(l) >= {_NGRAM}
), eval_sh AS (
  SELECT DISTINCT s FROM sh WHERE doc_id % {_EVAL_MOD} = 0
), contaminated AS (
  SELECT DISTINCT doc_id FROM sh SEMI JOIN eval_sh USING (s)
), clean AS (
  SELECT d.doc_id, d.n_chars FROM deduped d ANTI JOIN contaminated c USING (doc_id)
), labeled AS (
  SELECT doc_id, n_chars,
         CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT) % 100 AS b
  FROM clean
)
SELECT CASE WHEN b < 98 THEN 'train' WHEN b < 99 THEN 'val' ELSE 'test' END AS split,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS chars_total,
       CAST(SUM(doc_id) AS BIGINT) AS id_checksum
FROM labeled GROUP BY 1 ORDER BY split
"""
