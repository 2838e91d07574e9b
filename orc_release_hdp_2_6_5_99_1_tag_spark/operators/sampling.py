"""Data-selection / importance-sampling operators for training-data
pipelines (SURVEY §2.13 north-star extensions).

i1 is the DSIR shape (Xie et al. 2023, "Data Selection for Language
Models via Importance Resampling"): score every candidate document by
the log-likelihood ratio of a hashed-n-gram bag-of-words model of a
TARGET (in-domain) corpus vs the RAW candidate pool, then keep the
top-scoring documents. All model state is a fixed B-bucket table —
kilobytes, broadcast — so the operator is two narrow corpus scans plus
one doc-keyed shuffle regardless of corpus size.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from orc_release_hdp_2_6_5_99_1_tag_spark.tables import load_table

_DSIR_BUCKETS = 512       # hashed feature buckets (B)
_DSIR_TARGET = "src0"     # in-domain proxy: documents from this source
_DSIR_KEEP = 50           # resampled candidate count


def _bucket_col(tok):
    """Deterministic md5-derived feature bucket for a token column —
    the same 32-bit-hash recipe the dedup family uses, mod B, so the
    DuckDB oracle replays it bit-for-bit."""
    h = F.conv(F.substring(F.md5(tok), 1, 8), 16, 10).cast("bigint")
    return (h % _DSIR_BUCKETS).alias("b")


def importance_scores(d: DataFrame) -> DataFrame:
    """(doc_id, source, n_tokens, score) for every NON-target document.

    score = mean over token occurrences of
            ln p_target(bucket) − ln p_raw(bucket)
    with add-one smoothing over B buckets — the unigram DSIR
    importance weight, length-normalized so long documents are not
    favored.

    Scale shape: ONE scan builds the B-row bucket-count table (single
    groupBy with conditional sums — map-side partials make the shuffle
    B-bounded); the log-ratio table stays B rows (kilobytes) and is
    BROADCAST back onto a second token scan; per-doc aggregation is
    the only corpus-sized shuffle (keyed by doc_id, no skew: documents
    are unique keys). No driver collect anywhere — token totals come
    from a one-row aggregate of the B-row table, broadcast back.
    """
    tok = d.select(
        "doc_id",
        "source",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("w"),
    ).select("doc_id", "source", _bucket_col(F.col("w")))
    is_t = F.col("source") == _DSIR_TARGET
    cnt = tok.groupBy("b").agg(
        F.sum(F.when(is_t, 1).otherwise(0)).alias("ct"),
        F.sum(F.when(~is_t, 1).otherwise(0)).alias("cr"),
    )
    tot = cnt.agg(F.sum("ct").alias("nt"), F.sum("cr").alias("nr"))
    lr = cnt.crossJoin(F.broadcast(tot)).select(
        "b",
        (
            F.log((F.col("ct") + 1.0) / (F.col("nt") + _DSIR_BUCKETS))
            - F.log((F.col("cr") + 1.0) / (F.col("nr") + _DSIR_BUCKETS))
        ).alias("lr"),
    )
    return (
        tok.filter(~is_t)
        .join(F.broadcast(lr), "b")
        .groupBy("doc_id")
        .agg(
            F.min("source").alias("source"),
            F.count(F.lit(1)).alias("n_tokens"),
            (F.sum("lr") / F.count(F.lit(1))).alias("score"),
        )
    )


def i1_importance_resampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data selection: keep the 50 candidate documents whose
    hashed-unigram distribution looks most like the target domain
    (source 'src0'). Deterministic end-to-end: fixed hash buckets,
    add-one smoothing, and a (rounded-score, doc_id) keep order both
    engines reproduce identically."""
    d = load_table(spark, sf_dir, "documents")
    scored = importance_scores(d)
    return (
        scored.orderBy(F.round(F.col("score"), 6).desc(), "doc_id")
        .limit(_DSIR_KEEP)
        .select(
            "doc_id",
            "source",
            "n_tokens",
            F.format_string("%.5f", F.col("score")).alias("score"),
        )
    )


I1_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, source,
         unnest(string_split_regex(trim(lower(text)), '\\s+')) AS w
  FROM documents
), tb AS (
  SELECT doc_id, source,
         CAST(concat('0x', substr(md5(w), 1, 8)) AS BIGINT) % {_DSIR_BUCKETS} AS b
  FROM tok
), cnt AS (
  SELECT b,
         SUM(CASE WHEN source = '{_DSIR_TARGET}' THEN 1 ELSE 0 END) AS ct,
         SUM(CASE WHEN source <> '{_DSIR_TARGET}' THEN 1 ELSE 0 END) AS cr
  FROM tb GROUP BY b
), lr AS (
  SELECT b,
         ln((ct + 1.0) / (CAST(SUM(ct) OVER () AS DOUBLE) + {_DSIR_BUCKETS}))
       - ln((cr + 1.0) / (CAST(SUM(cr) OVER () AS DOUBLE) + {_DSIR_BUCKETS})) AS lr
  FROM cnt
), scored AS (
  SELECT tb.doc_id,
         MIN(tb.source) AS source,
         COUNT(*) AS n_tokens,
         SUM(lr.lr) / COUNT(*) AS score
  FROM tb JOIN lr USING (b)
  WHERE tb.source <> '{_DSIR_TARGET}'
  GROUP BY tb.doc_id
)
SELECT doc_id, source, n_tokens, printf('%.5f', score) AS score
FROM scored
ORDER BY round(score, 6) DESC, doc_id
LIMIT {_DSIR_KEEP}
"""


# ---------------------------------------------------------------------------
# i2: CCNet-style perplexity-band filter
# ---------------------------------------------------------------------------

_PPL_HEAD = 29.0   # fixed band thresholds (CCNet uses per-language
_PPL_MIDDLE = 30.0 # constants tuned offline, exactly this shape)


def i2_perplexity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style quality banding: score every document by the
    perplexity of a hashed-unigram language model trained on the corpus
    itself, then band into head / middle / tail with FIXED thresholds
    (CCNet's production recipe — thresholds are per-language constants
    tuned offline, NOT data-dependent quantiles, which keeps the
    operator a pure map: no global sort, no ntile window over the whole
    corpus).

    ppl(doc) = exp(−mean token ln p(bucket)), add-one smoothing over
    the B-bucket hashed vocabulary. Scale shape identical to i1: B-row
    LM table from one conditional groupBy, broadcast back onto a second
    token scan, one doc-keyed shuffle; banding and the final per
    (source, band) rollup are map-side-combinable aggregations.
    """
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        "source",
        "n_chars",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("w"),
    ).select("doc_id", "source", "n_chars", _bucket_col(F.col("w")))
    cnt = tok.groupBy("b").agg(F.count(F.lit(1)).alias("c"))
    tot = cnt.agg(F.sum("c").alias("n"))
    lm = cnt.crossJoin(F.broadcast(tot)).select(
        "b", F.log((F.col("c") + 1.0) / (F.col("n") + _DSIR_BUCKETS)).alias("lp")
    )
    doc = (
        tok.join(F.broadcast(lm), "b")
        .groupBy("doc_id")
        .agg(
            F.min("source").alias("source"),
            F.min("n_chars").alias("n_chars"),
            F.exp(-F.sum("lp") / F.count(F.lit(1))).alias("ppl"),
        )
    )
    band = (
        F.when(F.round(F.col("ppl"), 6) < _PPL_HEAD, "head")
        .when(F.round(F.col("ppl"), 6) < _PPL_MIDDLE, "middle")
        .otherwise("tail")
    )
    return (
        doc.select("source", band.alias("band"), "n_chars", "doc_id")
        .groupBy("source", "band")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("chars_total"),
            F.sum("doc_id").alias("doc_checksum"),
        )
        .orderBy("source", "band")
    )


I2_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, source, n_chars,
         unnest(string_split_regex(trim(lower(text)), '\\s+')) AS w
  FROM documents
), tb AS (
  SELECT doc_id, source, n_chars,
         CAST(concat('0x', substr(md5(w), 1, 8)) AS BIGINT) % {_DSIR_BUCKETS} AS b
  FROM tok
), cnt AS (
  SELECT b, COUNT(*) AS c FROM tb GROUP BY b
), lm AS (
  SELECT b, ln((c + 1.0) / (CAST(SUM(c) OVER () AS DOUBLE) + {_DSIR_BUCKETS})) AS lp
  FROM cnt
), doc AS (
  SELECT tb.doc_id, MIN(tb.source) AS source, MIN(tb.n_chars) AS n_chars,
         exp(-SUM(lm.lp) / COUNT(*)) AS ppl
  FROM tb JOIN lm USING (b) GROUP BY tb.doc_id
), banded AS (
  SELECT source, n_chars, doc_id,
         CASE WHEN round(ppl, 6) < {_PPL_HEAD} THEN 'head'
              WHEN round(ppl, 6) < {_PPL_MIDDLE} THEN 'middle'
              ELSE 'tail' END AS band
  FROM doc
)
SELECT source, band, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS chars_total,
       CAST(SUM(doc_id) AS BIGINT) AS doc_checksum
FROM banded GROUP BY source, band ORDER BY source, band
"""


# ---------------------------------------------------------------------------
# i3: exact-quota stratified sampling (deterministic md5 order)
# ---------------------------------------------------------------------------

_STRAT_DEN = 5  # keep ceil(n/5) per stratum (a 20% stratified sample)


def i3_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-quota stratified sampling: keep ceil(n/5) documents per
    (lang, source) stratum, chosen by md5(doc_id) rank — the
    train-data curation staple (`sample.py --per-source-quota`) where
    Bernoulli sampling is NOT acceptable because quotas must be hit
    exactly and reruns must pick the same rows (md5 order is a
    deterministic shuffle, identical across engines and retries).

    Spark-first: one shuffle on the stratum key serves BOTH windows
    (count(*) per stratum and the md5 row_number share the partition
    key, so Catalyst plans a single exchange); the quota is integer
    arithmetic ((n+4) div 5 — no float ceil at stratum-count
    boundaries). Per-stratum output keeps the result driver-small at
    any corpus size; the sampled rows themselves stay distributed.
    Stratum skew is the only hazard at 100 TB — a hot stratum's
    window sort is bounded by that stratum's size, and the md5 rank
    needs no global sort.
    """
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", F.md5(F.col("doc_id").cast("string")).alias("h")
    )
    wk = Window.partitionBy("lang", "source")
    ranked = d.withColumn("n", F.count(F.lit(1)).over(wk)).withColumn(
        "rk", F.row_number().over(wk.orderBy("h", "doc_id"))
    )
    sampled = ranked.filter(F.col("rk") <= F.expr(f"(n + {_STRAT_DEN - 1}) div {_STRAT_DEN}"))
    return (
        sampled.groupBy("lang", "source")
        .agg(
            F.min("n").alias("n_total"),
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum("doc_id").alias("id_checksum"),
            F.min("doc_id").alias("min_id"),
            F.max("doc_id").alias("max_id"),
        )
        .orderBy("lang", "source")
    )


I3_ORACLE = f"""
WITH d AS (
  SELECT doc_id, lang, source, md5(CAST(doc_id AS VARCHAR)) AS h FROM documents
), ranked AS (
  SELECT doc_id, lang, source,
         COUNT(*) OVER (PARTITION BY lang, source) AS n,
         ROW_NUMBER() OVER (PARTITION BY lang, source ORDER BY h, doc_id) AS rk
  FROM d
), sampled AS (
  SELECT * FROM ranked WHERE rk <= (n + {_STRAT_DEN - 1}) // {_STRAT_DEN}
)
SELECT lang, source, MIN(n) AS n_total, COUNT(*) AS n_sampled,
       CAST(SUM(doc_id) AS BIGINT) AS id_checksum,
       MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
FROM sampled GROUP BY lang, source ORDER BY lang, source
"""
