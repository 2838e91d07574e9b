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
