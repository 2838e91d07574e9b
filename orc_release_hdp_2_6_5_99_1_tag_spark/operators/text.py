"""Text-analysis operators for large-scale training-data pipelines
(SURVEY §2.13 north-star extensions): token counting, document
fingerprinting, language-ID heuristic, quality scoring.

All operators are pure built-in-function pipelines (JVM-side, inside
whole-stage codegen — no Python UDFs), so they scale linearly with the
scan and shuffle nothing except final aggregates.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from orc_release_hdp_2_6_5_99_1_tag_spark.tables import load_table

# BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation.
_BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

_STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it"]


def x1_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token count + BPE-ish regex token count + char stats
    per document, with corpus totals checkable at any scale."""
    d = load_table(spark, sf_dir, "documents")
    per_doc = d.select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("ws_tokens"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(_BPE_RE), 0)).alias("bpe_tokens"),
        F.length("text").alias("n_chars_actual"),
    )
    return per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("ws_tokens").alias("total_ws_tokens"),
        F.sum("bpe_tokens").alias("total_bpe_tokens"),
        F.sum("n_chars_actual").alias("total_chars"),
        F.min("ws_tokens").alias("min_ws_tokens"),
        F.max("ws_tokens").alias("max_ws_tokens"),
    )


X1_ORACLE = f"""
SELECT COUNT(*) AS n_docs,
       CAST(SUM(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT) AS total_ws_tokens,
       CAST(SUM(len(regexp_extract_all(text, '{_BPE_RE}'))) AS BIGINT) AS total_bpe_tokens,
       CAST(SUM(length(text)) AS BIGINT) AS total_chars,
       MIN(len(string_split_regex(trim(text), '\\s+'))) AS min_ws_tokens,
       MAX(len(string_split_regex(trim(text), '\\s+'))) AS max_ws_tokens
FROM documents
"""


def _normalized():
    return F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))


_RH_MOD = 1_000_000_007
_RH_BASE = 31


def x2_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: md5 of whitespace-normalized lowercased
    text (the exact-dedup key), a 16-hex-digit prefix fingerprint, and
    a Karp-Rabin polynomial ROLLING hash over the first 512 normalized
    codepoints (acc·31 + c mod 1e9+7) — computed JVM-side with an
    `aggregate` lambda, `list_reduce` in the oracle. Bounded prefix
    because Spark evaluates higher-order-function lambdas interpreted
    (not codegen): per-char cost over unbounded documents would
    dominate the scan at scale; 512 chars is the usual
    windowed-fingerprint compromise."""
    d = load_table(spark, sf_dir, "documents")
    rolling = F.aggregate(
        F.split(F.substring(_normalized(), 1, 512), ""),
        F.lit(0).cast("bigint"),
        lambda acc, c: (acc * F.lit(_RH_BASE) + F.ascii(c)) % F.lit(_RH_MOD),
    )
    return d.select(
        "doc_id",
        F.md5(_normalized()).alias("fingerprint"),
        F.substring(F.md5(_normalized()), 1, 16).alias("fingerprint64"),
        rolling.alias("rolling_fp"),
    ).orderBy("doc_id")


_SQL_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"

X2_ORACLE = f"""
WITH n AS MATERIALIZED (
  SELECT doc_id, {_SQL_NORM} AS norm, substr({_SQL_NORM}, 1, 512) AS p
  FROM documents
)
SELECT doc_id,
       md5(norm) AS fingerprint,
       substr(md5(norm), 1, 16) AS fingerprint64,
       list_reduce(
         list_prepend(CAST(0 AS BIGINT),
           list_transform(generate_series(1, length(p)),
                          i -> CAST(ascii(substr(p, i, 1)) AS BIGINT))),
         (acc, c) -> (acc * {_RH_BASE} + c) % {_RH_MOD}) AS rolling_fp
FROM n ORDER BY doc_id
"""


def x3_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram/stopword language-ID heuristic: English-stopword density
    over whitespace tokens decides en vs unknown; reported against the
    corpus `lang` labels. (The synthetic corpus is English-ish word
    salad for every label — the operator demonstrates the pipeline
    shape; parity with the oracle is what is being checked.)"""
    d = load_table(spark, sf_dir, "documents")
    toks = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    hits = F.size(
        F.regexp_extract_all(
            F.concat(F.lit(" "), F.lower(F.col("text")), F.lit(" ")),
            F.lit(r"\s(" + "|".join(_STOPWORDS) + r")\s"),
            0,
        )
    )
    scored = d.select(
        "doc_id",
        "lang",
        toks.alias("n_tokens"),
        hits.alias("stopword_hits"),
        (hits / toks).alias("stopword_ratio"),
        # per-doc ratio quantized to integer ppm (identical IEEE
        # mul-div-floor in both engines) so the group mean is ONE exact
        # bigint sum + cast-then-divide — a bare AVG over per-doc
        # double ratios is partition-order-dependent (the a8 rule; same
        # fix as x22's mean_novelty)
        F.floor(hits * F.lit(1000000.0) / toks).cast("bigint").alias("ratio_ppm"),
    ).withColumn(
        "lang_pred",
        F.when(F.col("stopword_ratio") >= 0.05, F.lit("en")).otherwise(F.lit("unk")),
    )
    return (
        scored.groupBy("lang", "lang_pred")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(
                F.sum("ratio_ppm").cast("double")
                / F.count(F.lit(1)).cast("double")
                / 1000000.0,
                6,
            ).alias("avg_stopword_ratio"),
        )
        .orderBy("lang", "lang_pred")
    )


X3_ORACLE = f"""
WITH scored AS (
  SELECT doc_id, lang,
         len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
         len(regexp_extract_all(' ' || lower(text) || ' ',
             '\\s({"|".join(_STOPWORDS)})\\s')) AS stopword_hits
  FROM documents
), pred AS (
  SELECT lang,
         CASE WHEN CAST(stopword_hits AS DOUBLE)/n_tokens >= 0.05
              THEN 'en' ELSE 'unk' END AS lang_pred,
         CAST(FLOOR(CAST(stopword_hits AS DOUBLE) * 1000000.0 / n_tokens) AS BIGINT)
           AS ratio_ppm
  FROM scored
)
SELECT lang, lang_pred, COUNT(*) AS n_docs,
       ROUND(CAST(SUM(ratio_ppm) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
             / 1000000.0, 6) AS avg_stopword_ratio
FROM pred GROUP BY lang, lang_pred ORDER BY lang, lang_pred
"""


def x4_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length / punctuation-density / mean-word-length
    signals combined into a [0,1] score; corpus distribution returned
    per source (the filter a pretraining pipeline applies before
    tokenization)."""
    d = load_table(spark, sf_dir, "documents")
    n_chars = F.length("text")
    n_tokens = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    punct = F.length(F.regexp_replace(F.col("text"), r"[^.,!?;:]", ""))
    scored = d.select(
        "doc_id",
        "source",
        (
            F.least(n_chars / F.lit(500.0), F.lit(1.0)) * 0.4
            + (F.lit(1.0) - F.least(punct / (n_tokens + F.lit(1)), F.lit(1.0))) * 0.3
            + F.least((n_chars / n_tokens) / F.lit(10.0), F.lit(1.0)) * 0.3
        ).alias("quality"),
    )
    # per-doc score quantized to integer ppm before the mean (the a8
    # rule — min/max are order-independent and stay on the raw double)
    scored = scored.withColumn(
        "q_ppm", F.floor(F.col("quality") * F.lit(1000000.0)).cast("bigint")
    )
    return (
        scored.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(
                F.sum("q_ppm").cast("double")
                / F.count(F.lit(1)).cast("double")
                / 1000000.0,
                6,
            ).alias("avg_quality"),
            F.round(F.min("quality"), 6).alias("min_quality"),
            F.round(F.max("quality"), 6).alias("max_quality"),
        )
        .orderBy("source")
    )


X4_ORACLE = """
WITH scored AS (
  SELECT source,
         LEAST(length(text)/500.0, 1.0) * 0.4
         + (1.0 - LEAST(length(regexp_replace(text, '[^.,!?;:]', '', 'g'))
                        / CAST(len(string_split_regex(trim(text), '\\s+')) + 1 AS DOUBLE), 1.0)) * 0.3
         + LEAST((CAST(length(text) AS DOUBLE)/len(string_split_regex(trim(text), '\\s+')))/10.0, 1.0) * 0.3
         AS quality
  FROM documents
)
SELECT source, COUNT(*) AS n_docs,
       ROUND(CAST(SUM(CAST(FLOOR(quality * 1000000.0) AS BIGINT)) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) / 1000000.0, 6) AS avg_quality,
       ROUND(MIN(quality), 6) AS min_quality,
       ROUND(MAX(quality), 6) AS max_quality
FROM scored GROUP BY source ORDER BY source
"""


def split_label_col():
    """Deterministic 98/1/1 train/val/test label from the md5(doc_id)
    bucket (shared by x5 and pipe1; SQL twins: SQL_SPLIT_BUCKET /
    SQL_SPLIT_LABEL)."""
    bucket = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10).cast(
        "bigint"
    ) % 100
    return (
        F.when(bucket < 98, F.lit("train"))
        .when(bucket < 99, F.lit("val"))
        .otherwise(F.lit("test"))
    )


SQL_SPLIT_BUCKET = (
    "CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT) % 100"
)
SQL_SPLIT_LABEL = "CASE WHEN b < 98 THEN 'train' WHEN b < 99 THEN 'val' ELSE 'test' END"


def x5_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic corpus splitting — the held-out-set primitive every
    training pipeline needs: each document lands in train/val/test by
    the range of its md5(doc_id) bucket (98/1/1), so the assignment is
    stable across runs, engines, and cluster layouts (no RNG, no
    sampling drift). Narrow map + one aggregate; the split column also
    serves as a partition key for split-separated writes."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("doc_id", "n_chars", split_label_col().alias("split"))
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("doc_id").alias("id_checksum"),
            F.sum("n_chars").alias("chars_total"),
        )
        .orderBy("split")
    )


X5_ORACLE = f"""
WITH s AS (
  SELECT doc_id, n_chars, {SQL_SPLIT_BUCKET} AS b
  FROM documents
)
SELECT {SQL_SPLIT_LABEL} AS split,
       COUNT(*) AS n_docs,
       CAST(SUM(doc_id) AS BIGINT) AS id_checksum,
       CAST(SUM(n_chars) AS BIGINT) AS chars_total
FROM s GROUP BY 1 ORDER BY split
"""


# Gopher-style repetition thresholds (Rae et al. 2021 §A1.1 shape):
# a document is flagged repetitive when its most frequent bigram covers
# >8% of all bigram slots or its unique-token ratio falls below 30%.
_TOP_BIGRAM_PPM = 80_000
_UNIQ_TOKEN_PPM = 300_000


def x6_repetition_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-based quality filtering (the Gopher rules family):
    per-document duplicate-bigram fraction, top-bigram fraction, and
    unique-token ratio, aggregated per source with a repetitive-doc
    flag count.

    All fractions are computed in exact integer parts-per-million
    (x*1_000_000 DIV total) so the corpus-level sums are
    engine-exact — no float accumulation drift between Spark and the
    oracle.

    Scale shape: explode(bigrams) is a narrow map; the only shuffles
    are the two-level (doc_id, bigram) -> doc_id aggregation — the
    same count-distinct-style plan Spark already picks for skewless
    word-count at any corpus size. No per-doc data ever collects to
    the driver, and the bigram space is bounded by doc length, not
    corpus size."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        "source",
        F.split(F.trim(F.col("text")), r"\s+").alias("t"),
    ).select(
        "doc_id",
        "source",
        F.size("t").alias("n_tok"),
        F.size(F.array_distinct("t")).alias("n_uniq"),
        # bigrams via zip_with over the array and its shifted slice —
        # NOT transform(sequence(..), i -> .. t[i] ..): this projection
        # collapses with the split() one above, so every t[i] lambda
        # reference re-evaluates the regex split per ELEMENT, turning
        # the per-doc cost quadratic (measured r14: the explode stage
        # alone 9.98s -> 1.17s at sf0.1, identical rows; x6 end-to-end
        # 11.1s -> ~2s). zip_with binds elements BY VALUE, so the
        # collapsed expression evaluates split once per argument.
        F.when(
            F.size("t") >= 2,
            F.expr(
                "slice(zip_with(t, slice(t, 2, size(t)-1),"
                " (x, y) -> concat_ws(' ', x, y)), 1, size(t)-1)"
            ),
        ).otherwise(F.array(F.lit(None).cast("string"))).alias("bigrams"),
    )
    bg_counts = (
        toks.select("doc_id", "source", "n_tok", "n_uniq", F.explode("bigrams").alias("bg"))
        .groupBy("doc_id", "source", "n_tok", "n_uniq", "bg")
        .agg(F.count("bg").alias("c"))
    )
    per_doc = bg_counts.groupBy("doc_id", "source", "n_tok", "n_uniq").agg(
        F.sum("c").alias("total_bg"),
        F.max("c").alias("top_bg"),
        F.count(F.col("c")).alias("uniq_bg"),
    )
    ppm = per_doc.select(
        "doc_id",
        "source",
        F.when(F.col("total_bg") > 0, F.expr("1000000 * top_bg DIV total_bg"))
        .otherwise(F.lit(0))
        .alias("top_bg_ppm"),
        F.when(F.col("total_bg") > 0, F.expr("1000000 * (total_bg - uniq_bg) DIV total_bg"))
        .otherwise(F.lit(0))
        .alias("dup_bg_ppm"),
        F.expr("1000000 * n_uniq DIV n_tok").alias("uniq_tok_ppm"),
    )
    flagged = (
        (F.col("top_bg_ppm") > _TOP_BIGRAM_PPM) | (F.col("uniq_tok_ppm") < _UNIQ_TOKEN_PPM)
    ).cast("int")
    return (
        ppm.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(flagged).alias("n_repetitive"),
            F.sum("top_bg_ppm").alias("top_bg_ppm_sum"),
            F.sum("dup_bg_ppm").alias("dup_bg_ppm_sum"),
            F.sum("uniq_tok_ppm").alias("uniq_tok_ppm_sum"),
        )
        .orderBy("source")
    )


X6_ORACLE = f"""
WITH t AS MATERIALIZED (
  SELECT doc_id, source, string_split_regex(trim(text), '\\s+') AS l
  FROM documents
),
tok AS MATERIALIZED (
  SELECT doc_id, source, len(l) AS n_tok, len(list_distinct(l)) AS n_uniq, l
  FROM t
),
bg AS (
  SELECT tok.doc_id, l[i] || ' ' || l[i+1] AS bg
  FROM tok, unnest(range(1, n_tok)) AS u(i)
  WHERE n_tok >= 2
),
bgc AS (
  SELECT doc_id, bg, COUNT(*) AS c FROM bg GROUP BY doc_id, bg
),
per_doc AS (
  SELECT tok.doc_id, tok.source, tok.n_tok, tok.n_uniq,
         COALESCE(SUM(c), 0) AS total_bg,
         COALESCE(MAX(c), 0) AS top_bg,
         COALESCE(COUNT(bgc.bg), 0) AS uniq_bg
  FROM tok LEFT JOIN bgc ON tok.doc_id = bgc.doc_id
  GROUP BY tok.doc_id, tok.source, tok.n_tok, tok.n_uniq
),
ppm AS (
  SELECT doc_id, source,
         CASE WHEN total_bg > 0 THEN (1000000 * top_bg) // total_bg ELSE 0 END AS top_bg_ppm,
         CASE WHEN total_bg > 0 THEN (1000000 * (total_bg - uniq_bg)) // total_bg ELSE 0 END AS dup_bg_ppm,
         (1000000 * n_uniq) // n_tok AS uniq_tok_ppm
  FROM per_doc
)
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN top_bg_ppm > {_TOP_BIGRAM_PPM}
                      OR uniq_tok_ppm < {_UNIQ_TOKEN_PPM} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_repetitive,
       CAST(SUM(top_bg_ppm) AS BIGINT) AS top_bg_ppm_sum,
       CAST(SUM(dup_bg_ppm) AS BIGINT) AS dup_bg_ppm_sum,
       CAST(SUM(uniq_tok_ppm) AS BIGINT) AS uniq_tok_ppm_sum
FROM ppm GROUP BY source ORDER BY source
"""


# PII patterns — intersection of Java-regex (Spark) and RE2 (DuckDB)
# syntax: character classes, bounded repetition, \b word boundaries.
_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"
_IP_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def x7_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing — the redaction pass every training pipeline runs
    before the tokenizer: find-and-mask emails, phone numbers, and IPv4
    addresses with typed placeholder tags. The synthetic corpus carries
    no PII, so a deterministic injection step (keyed on doc_id, applied
    identically in the oracle) plants all three kinds first; the
    operator under test is the redaction, which is pure
    `regexp_extract_all`/`regexp_replace` built-ins — narrow map, full
    codegen, no shuffle until the per-source rollup.

    Reports per source: docs touched, per-kind match counts, and the
    exact character delta between raw and redacted text."""
    d = load_table(spark, sf_dir, "documents")
    injected = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat_ws(
                "", F.lit(" contact user"), F.col("doc_id").cast("string"), F.lit("@example.com")
            ),
        ).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 5 == 0, F.lit(" call 555-123-4567")).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat_ws(
                "",
                F.lit(" from 10.0."),
                (F.col("doc_id") % 256).cast("string"),
                F.lit("."),
                ((F.col("doc_id") * 7) % 256).cast("string"),
            ),
        ).otherwise(F.lit("")),
    )
    per_doc = d.select(
        "doc_id",
        "source",
        injected.alias("raw"),
    ).select(
        "doc_id",
        "source",
        F.length("raw").alias("raw_len"),
        F.size(F.regexp_extract_all(F.col("raw"), F.lit(_EMAIL_RE), 0)).alias("n_email"),
        F.size(F.regexp_extract_all(F.col("raw"), F.lit(_PHONE_RE), 0)).alias("n_phone"),
        F.size(F.regexp_extract_all(F.col("raw"), F.lit(_IP_RE), 0)).alias("n_ip"),
        F.length(
            F.regexp_replace(
                F.regexp_replace(
                    F.regexp_replace(F.col("raw"), _EMAIL_RE, "<EMAIL>"),
                    _PHONE_RE,
                    "<PHONE>",
                ),
                _IP_RE,
                "<IP>",
            )
        ).alias("red_len"),
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(((F.col("n_email") + F.col("n_phone") + F.col("n_ip")) > 0).cast("int")).alias(
                "n_docs_with_pii"
            ),
            F.sum("n_email").alias("n_emails"),
            F.sum("n_phone").alias("n_phones"),
            F.sum("n_ip").alias("n_ips"),
            F.sum(F.col("raw_len") - F.col("red_len")).alias("chars_redacted"),
        )
        .orderBy("source")
    )


X7_ORACLE = f"""
WITH injected AS (
  SELECT doc_id, source,
         text
         || CASE WHEN doc_id % 3 = 0
                 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
                 ELSE '' END
         || CASE WHEN doc_id % 5 = 0 THEN ' call 555-123-4567' ELSE '' END
         || CASE WHEN doc_id % 7 = 0
                 THEN ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR)
                      || '.' || CAST((doc_id * 7) % 256 AS VARCHAR)
                 ELSE '' END AS raw
  FROM documents
), per_doc AS (
  SELECT doc_id, source, length(raw) AS raw_len,
         len(regexp_extract_all(raw, '{_EMAIL_RE}')) AS n_email,
         len(regexp_extract_all(raw, '{_PHONE_RE}')) AS n_phone,
         len(regexp_extract_all(raw, '{_IP_RE}')) AS n_ip,
         length(regexp_replace(regexp_replace(regexp_replace(raw,
                 '{_EMAIL_RE}', '<EMAIL>', 'g'),
                 '{_PHONE_RE}', '<PHONE>', 'g'),
                 '{_IP_RE}', '<IP>', 'g')) AS red_len
  FROM injected
)
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN n_email + n_phone + n_ip > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_docs_with_pii,
       CAST(SUM(n_email) AS BIGINT) AS n_emails,
       CAST(SUM(n_phone) AS BIGINT) AS n_phones,
       CAST(SUM(n_ip) AS BIGINT) AS n_ips,
       CAST(SUM(raw_len - red_len) AS BIGINT) AS chars_redacted
FROM per_doc GROUP BY source ORDER BY source
"""


_SEQ_LEN = 512       # training sequence length (tokens)
_PACK_BUCKET = 1024  # doc_id bucket width for the two-phase offsets


def pack_start_offsets(docs: DataFrame) -> DataFrame:
    """Running token offset per (source, doc_id-ordered) document over
    (doc_id, source, n_tok) rows, computed with the two-phase
    distributed-offset shape (see x8 docstring): bucket token sums →
    running offset over SUMS → bounded in-bucket window. Equivalent to
    one cumulative window per source (the oracle form;
    `tests/test_scale_shapes.py` asserts equivalence on a skewed 2M-row
    corpus). Adds column `start`."""
    from pyspark.sql import Window

    docs = docs.withColumn("b", F.expr(f"doc_id DIV {_PACK_BUCKET}"))
    bsum = docs.groupBy("source", "b").agg(F.sum("n_tok").alias("bt"))
    w_boff = Window.partitionBy("source").orderBy("b").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offs = bsum.withColumn("boff", F.coalesce(F.sum("bt").over(w_boff), F.lit(0))).select(
        "source", "b", "boff"
    )
    w_in = Window.partitionBy("source", "b").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    return (
        docs.join(offs, ["source", "b"])
        .withColumn("start", F.col("boff") + F.coalesce(F.sum("n_tok").over(w_in), F.lit(0)))
        .drop("b", "boff")
    )


def x8_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing — the concat-and-chunk step that turns variable
    -length documents into fixed 512-token training sequences: within
    each source, documents concatenate in doc_id order; each doc's
    start offset is the running token total before it; its bin is
    `start DIV 512`. Reports per source: docs, tokens, bins produced,
    and how many documents straddle a bin boundary.

    Scale shape — the same two-phase distributed offset as
    `f12_row_seek`, because a naive per-source cumulative window is a
    single reducer per source: phase 1 aggregates token sums per
    (source, 1024-doc bucket) and runs the running-offset window over
    BUCKET SUMS only (tiny); phase 2 joins the bucket offset back and
    windows within each bounded bucket. No window ever sees more than
    1024 rows or one bucket-sum row per 1024 docs."""
    d = load_table(spark, sf_dir, "documents")
    docs = d.select(
        "doc_id",
        "source",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("n_tok"),
    )
    placed = pack_start_offsets(docs).select(
        "source",
        "n_tok",
        F.expr(f"start DIV {_SEQ_LEN}").alias("bin_start"),
        F.expr(f"(start + n_tok - 1) DIV {_SEQ_LEN}").alias("bin_end"),
    )
    return (
        placed.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("total_tokens"),
            (F.max("bin_end") + 1).alias("n_bins"),
            F.sum((F.col("bin_start") != F.col("bin_end")).cast("int")).alias("n_spanning"),
        )
        .orderBy("source")
    )


X8_ORACLE = f"""
WITH docs AS (
  SELECT doc_id, source, len(string_split_regex(trim(text), '\\s+')) AS n_tok
  FROM documents
), placed AS (
  SELECT source, n_tok,
         COALESCE(SUM(n_tok) OVER (
           PARTITION BY source ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS start
  FROM docs
)
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
       CAST(MAX((start + n_tok - 1) // {_SEQ_LEN}) + 1 AS BIGINT) AS n_bins,
       CAST(SUM(CASE WHEN start // {_SEQ_LEN} != (start + n_tok - 1) // {_SEQ_LEN}
                THEN 1 ELSE 0 END) AS BIGINT) AS n_spanning
FROM placed GROUP BY source ORDER BY source
"""


_VOCAB_TOP_K = 50


def x9_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary head — the term-frequency table a tokenizer
    trainer reads first: top-50 tokens by total occurrences, with
    document frequency. The canonical word-count shape: explode is a
    narrow map, the count is one shuffle with map-side partial
    aggregation, and the top-K is `orderBy(...).limit(k)` which Spark
    executes as per-partition TakeOrdered + a k-row merge on the
    driver — no global sort materializes."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("tok"))
    counts = toks.groupBy("tok").agg(
        F.count(F.lit(1)).alias("tf"),
        F.count_distinct("doc_id").alias("df"),
    )
    return counts.orderBy(F.desc("tf"), F.asc("tok")).limit(_VOCAB_TOP_K)


X9_ORACLE = f"""
SELECT tok, COUNT(*) AS tf, COUNT(DISTINCT doc_id) AS df
FROM documents, LATERAL (
  SELECT unnest(string_split_regex(trim(text), '\\s+')) AS tok
) u
GROUP BY tok
ORDER BY tf DESC, tok ASC
LIMIT {_VOCAB_TOP_K}
"""


def x10_source_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted source mixing — the data-mixture step that turns
    per-source corpora into a training blend with target proportions
    (e.g. upweight wiki, downweight crawl). Target weight here derives
    from the source name (index+1) so the spec is engine-reproducible;
    production passes a weights dict the same way.

    Two-phase, like d9's domain cap: (1) a tiny per-source count
    aggregate (|sources| rows — model state, broadcastable) fixes the
    largest feasible total T = min n(s)/p(s) and per-source keep-rates
    r(s) = T·p(s)/n(s); (2) one narrow map keeps each doc iff its
    md5 bucket-fraction < r(source) — deterministic "sampling" with no
    RNG, stable across runs/engines/partitionings. The keep-rate
    arithmetic uses the identical operation order in both engines, so
    the float compare is bit-reproducible. At 100 TB phase 1 is a
    map-side-combined agg over source only; phase 2 is shuffle-free
    (the rates broadcast-join back on source)."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        (F.substring("source", 4, 10).cast("int") + 1).alias("w"),
        (
            F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6), 16, 10).cast(
                "bigint"
            )
            % 1_000_000
        ).alias("b"),
    )
    n = d.groupBy("source").agg(F.any_value("w").alias("w"), F.count(F.lit(1)).alias("n"))
    m = n.agg(F.min(F.col("n").cast("double") / F.col("w")).alias("mr"))
    rates = n.crossJoin(F.broadcast(m)).select(
        "source", "n", (F.col("mr") * F.col("w") / F.col("n")).alias("keep_rate")
    )
    kept = F.when(F.col("b").cast("double") / F.lit(1000000.0) < F.col("keep_rate"), 1)
    return (
        d.join(F.broadcast(rates), "source")
        .groupBy("source")
        .agg(
            F.any_value("n").cast("long").alias("n_in"),
            F.count(kept).cast("long").alias("n_kept"),
            F.printf(F.lit("%.6f"), F.any_value("keep_rate")).alias("keep_rate"),
            F.sum(F.when(kept.isNotNull(), F.col("doc_id"))).cast("long").alias("id_checksum"),
        )
        .orderBy("source")
    )


X10_ORACLE = """
WITH d AS (
  SELECT doc_id, source,
         CAST(SUBSTR(source, 4) AS INT) + 1 AS w,
         CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 6)) AS BIGINT) % 1000000 AS b
  FROM documents
), n AS (
  SELECT source, ANY_VALUE(w) AS w, COUNT(*) AS n FROM d GROUP BY source
), m AS (
  SELECT MIN(CAST(n AS DOUBLE) / w) AS mr FROM n
), r AS (
  SELECT n.source, n.n, m.mr * n.w / n.n AS keep_rate FROM n, m
)
SELECT d.source,
       CAST(ANY_VALUE(r.n) AS BIGINT) AS n_in,
       CAST(COUNT(CASE WHEN CAST(d.b AS DOUBLE)/1000000.0 < r.keep_rate THEN 1 END) AS BIGINT) AS n_kept,
       printf('%.6f', ANY_VALUE(r.keep_rate)) AS keep_rate,
       CAST(SUM(CASE WHEN CAST(d.b AS DOUBLE)/1000000.0 < r.keep_rate THEN d.doc_id END) AS BIGINT) AS id_checksum
FROM d JOIN r ON r.source = d.source
GROUP BY d.source ORDER BY d.source
"""


# ---------------------------------------------------------------------------
# round-3 additions: chunking, corpus-frequency quality, TF-IDF
# ---------------------------------------------------------------------------

# chunking constants: 64-token windows, 16-token overlap → 48-token step
_CHUNK, _OVERLAP = 64, 16
_STEP = _CHUNK - _OVERLAP


def _x11_chunks(d: DataFrame) -> DataFrame:
    """The shuffle-free chunk-emission plan (shared by the operator and
    the plan-shape test so the Exchange-free assertion binds to the
    shipped code). NULL-text documents yield no chunks — made explicit
    with a filter because Spark's legacy size(NULL) = -1 would
    otherwise fabricate one junk chunk where the oracle emits none."""
    toks = d.filter(F.col("text").isNotNull()).select(
        "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("toks")
    ).withColumn("n", F.size("toks"))
    n_chunks = F.greatest(
        F.lit(1), F.ceil((F.col("n") - F.lit(_OVERLAP)) / F.lit(_STEP))
    ).cast("int")
    chunks = toks.select(
        "doc_id",
        "toks",
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_ix"),
    )
    chunk = F.slice("toks", F.col("chunk_ix") * _STEP + 1, F.lit(_CHUNK))
    return chunks.select(
        "doc_id",
        "chunk_ix",
        F.size(chunk).alias("chunk_tokens"),
        F.md5(F.array_join(chunk, " ")).alias("chunk_hash"),
    )


def x11_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking (RAG / pretraining sequence
    prep): each document yields ceil((n_tokens-overlap)/step) chunks of
    up to 64 tokens with 16-token overlap, each with a content hash.

    Scale: one narrow projection + an explode — no shuffle at all; the
    chunk multiplier (~n_tokens/48) is the only data growth, identical
    at 100 TB. Chunk assembly is slice/array_join inside codegen, never
    Python.
    """
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return _x11_chunks(d).orderBy("doc_id", "chunk_ix")


X11_ORACLE = f"""
WITH t AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks,
         len(string_split_regex(trim(text), '\\s+')) AS n
  FROM documents WHERE doc_id < 100 AND text IS NOT NULL
), c AS (
  SELECT doc_id, toks,
         unnest(generate_series(0, GREATEST(1, CAST(CEIL((n - {_OVERLAP}) / {_STEP}.0) AS INT)) - 1)) AS chunk_ix
  FROM t
)
SELECT doc_id, CAST(chunk_ix AS INT) AS chunk_ix,
       CAST(len(list_slice(toks, chunk_ix*{_STEP}+1, chunk_ix*{_STEP}+{_CHUNK})) AS INT) AS chunk_tokens,
       md5(array_to_string(list_slice(toks, chunk_ix*{_STEP}+1, chunk_ix*{_STEP}+{_CHUNK}), ' ')) AS chunk_hash
FROM c
ORDER BY doc_id, chunk_ix
"""


def x12_token_freq_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-frequency quality proxy (the integer-exact core of
    CCNet-style LM filtering): phase 1 computes the corpus token
    document-frequency table; phase 2 scores each document by the
    summed corpus frequency of its tokens (common-token mass) — low
    sums flag gibberish, extreme sums flag boilerplate.

    Scale: one explode + one groupBy(token) for the frequency table
    (vocab-sized — small), broadcast back onto the token stream, one
    groupBy(doc). No window, no global sort; the vocab table is the
    classic broadcast dimension.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("tok"),
    )
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("freq"))
    return (
        toks.join(F.broadcast(freq), "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("freq").alias("sum_freq"),
            F.max("freq").alias("max_freq"),
        )
        .filter(F.col("doc_id") < 50)
        .orderBy("doc_id")
    )


X12_ORACLE = """
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
  FROM documents
), freq AS (
  SELECT tok, COUNT(*) AS freq FROM toks GROUP BY tok
)
SELECT t.doc_id,
       COUNT(*) AS n_tokens,
       CAST(SUM(f.freq) AS BIGINT) AS sum_freq,
       CAST(MAX(f.freq) AS BIGINT) AS max_freq
FROM toks t JOIN freq f USING (tok)
WHERE t.doc_id < 50
GROUP BY t.doc_id ORDER BY t.doc_id
"""


def x13_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 TF-IDF terms, integer-exact: score =
    (tf * 1e6) div df — term frequency within the doc scaled against
    corpus document frequency, ties broken lexicographically.

    Scale: tf is one groupBy(doc, token); df is one groupBy(token)
    (vocab-sized, broadcast); the top-3 window partitions by doc_id —
    per-key tiny. This is the standard two-phase sparse feature
    extraction shape; nothing grows superlinearly at 100 TB.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("tok"),
    )
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    df_ = toks.select("doc_id", "tok").distinct().groupBy("tok").agg(
        F.count(F.lit(1)).alias("df")
    )
    from pyspark.sql import Window

    scored = tf.join(F.broadcast(df_), "tok").withColumn(
        "score", F.expr("(tf * 1000000) div df")
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("tok"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter((F.col("rk") <= 3) & (F.col("doc_id") < 100))
        .select("doc_id", "rk", "tok", "tf", "df", "score")
        .orderBy("doc_id", "rk")
    )


X13_ORACLE = """
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
  FROM documents
), tf AS (
  SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY doc_id, tok
), df AS (
  SELECT tok, COUNT(*) AS df FROM (SELECT DISTINCT doc_id, tok FROM toks) GROUP BY tok
), scored AS (
  SELECT tf.doc_id, tf.tok, tf.tf, df.df, (tf.tf * 1000000) // df.df AS score
  FROM tf JOIN df USING (tok)
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, tok ASC) AS rk
  FROM scored
)
SELECT doc_id, CAST(rk AS INT) AS rk, tok, tf, CAST(df AS BIGINT) AS df,
       CAST(score AS BIGINT) AS score
FROM ranked WHERE rk <= 3 AND doc_id < 100
ORDER BY doc_id, rk
"""


def x14_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-card rollup: per-source corpus statistics (docs, token
    mass, char mass, language spread) with pivoted language counts —
    the datasheet a curation run publishes next to each shard.

    Scale: one scan, one groupBy(source) with map-side partials; the
    pivot's language set is declared (not inferred), so no extra
    distinct pass and the output width is fixed. Exact integers only.
    """
    langs = ["en", "de", "es", "zh"]
    # null-guarded: Spark's legacy size(NULL) = -1 would skew the token
    # SUM where the oracle's len(NULL) is NULL (skipped by SUM)
    d = load_table(spark, sf_dir, "documents").withColumn(
        "n_tokens",
        F.when(
            F.col("text").isNotNull(),
            F.size(F.split(F.trim(F.col("text")), r"\s+")),
        ),
    )
    base = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.sum(F.length("text")).alias("total_chars"),
        F.count_distinct("lang").alias("n_langs"),
        *[
            F.count(F.when(F.col("lang") == lg, 1)).alias(f"n_{lg}")
            for lg in langs
        ],
    )
    return base.orderBy("source")


X14_ORACLE = """
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT) AS total_tokens,
       CAST(SUM(length(text)) AS BIGINT) AS total_chars,
       COUNT(DISTINCT lang) AS n_langs,
       COUNT(CASE WHEN lang = 'en' THEN 1 END) AS n_en,
       COUNT(CASE WHEN lang = 'de' THEN 1 END) AS n_de,
       COUNT(CASE WHEN lang = 'es' THEN 1 END) AS n_es,
       COUNT(CASE WHEN lang = 'zh' THEN 1 END) AS n_zh
FROM documents
GROUP BY source ORDER BY source
"""


_N_SHARDS = 8


def x15_corpus_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global corpus shuffle + shard export — the final
    step of every training-data pipeline: order the corpus by a hash
    (so correlated documents scatter), cut it into N equal-ish shards,
    and emit each shard in a stable order that is identical across
    runs, engines, and cluster layouts.

    Spark-first: shard = md5(doc_id) mod N (one hash partitioning,
    the write-side `repartition(N, shard)`), position = rank within
    the shard by the full md5 hex — a WITHIN-shard sort only, never a
    global orderBy (at 100 TB a total sort is a range-exchange over
    everything; per-shard sorts are embarrassingly parallel). The
    query returns per-shard manifests (count, token total, and an
    order-sensitive checksum sum(doc_id * position) that any reorder
    or dropped row breaks) rather than the corpus itself.
    """
    d = load_table(spark, sf_dir, "documents")
    h = F.md5(F.col("doc_id").cast("string"))
    shard = (
        F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % _N_SHARDS
    ).cast("int")
    w = Window.partitionBy("shard").orderBy("h")
    return (
        d.select("doc_id", "n_chars", h.alias("h"), shard.alias("shard"))
        .withColumn("position", F.row_number().over(w))
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("chars_total"),
            F.sum(F.col("doc_id") * F.col("position")).alias("order_checksum"),
        )
        .orderBy("shard")
    )


X15_ORACLE = f"""
WITH h AS (
  SELECT doc_id, n_chars, md5(CAST(doc_id AS VARCHAR)) AS h,
         CAST(CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % {_N_SHARDS} AS INT) AS shard
  FROM documents
), pos AS (
  SELECT shard, doc_id, n_chars,
         ROW_NUMBER() OVER (PARTITION BY shard ORDER BY h) AS position
  FROM h
)
SELECT shard, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS chars_total,
       CAST(SUM(doc_id * position) AS BIGINT) AS order_checksum
FROM pos GROUP BY shard ORDER BY shard
"""


# ---------------------------------------------------------------------------
# x16: BPE pair statistics + distributed merge learning
# ---------------------------------------------------------------------------

_BPE_TOPK = 20


def adjacent_pair_counts(toks: DataFrame) -> DataFrame:
    """(pair, cnt) over a token-array column `t` — the inner loop of
    BPE vocabulary training: count every ADJACENT symbol pair in the
    corpus. A narrow transform+explode (one row per adjacency) into a
    single map-side-combined groupBy; no joins, no windows."""
    pairs = toks.select(
        F.explode(
            F.when(
                F.size("t") >= 2,
                F.expr(
                    "transform(sequence(0, size(t)-2),"
                    " i -> concat_ws(' ', t[i], t[i+1]))"
                ),
            ).otherwise(F.array())
        ).alias("pair")
    )
    return pairs.groupBy("pair").agg(F.count(F.lit(1)).alias("cnt"))


def x16_bpe_pair_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 adjacent token-pair counts over the corpus — the
    distributed primitive of BPE/WordPiece vocabulary training (each
    merge round = this query + merge the argmax pair). Deterministic
    order: count desc, then pair asc.

    Scale: tokenization and pair formation are narrow; the single
    groupBy(pair) shuffle is bounded by distinct adjacent pairs (≪
    corpus tokens after map-side partial aggregation); top-20 is a
    TakeOrdered, never a global sort. The full iterative merge loop
    (`learn_bpe_merges`) reruns this plan once per merge with the
    merged symbol folded in — corpus scans per round, model state
    (the merge table) always driver-sized, exactly the k-means
    topology.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(F.split(F.trim(F.lower(F.col("text"))), r"\s+").alias("t"))
    return (
        adjacent_pair_counts(toks)
        .orderBy(F.col("cnt").desc(), "pair")
        .limit(_BPE_TOPK)
    )


X16_ORACLE = f"""
WITH t AS (
  SELECT string_split_regex(trim(lower(text)), '\\s+') AS t FROM documents
), p AS (
  SELECT t[u.i] || ' ' || t[u.i + 1] AS pair
  FROM t, LATERAL (SELECT unnest(range(1, len(t))) AS i) u
  WHERE len(t) >= 2
)
SELECT pair, COUNT(*) AS cnt FROM p
GROUP BY pair ORDER BY cnt DESC, pair LIMIT {_BPE_TOPK}
"""


def merge_pair_col(t, pa: str, pb: str):
    """Fold one learned BPE merge (pa, pb) -> pa+pb into a token-array
    column: leftmost-first, non-overlapping — the canonical BPE merge
    pass, as a single JVM `aggregate` over the array (the accumulator
    either fuses the incoming token with the array's last element or
    appends it). No Python in the loop."""
    return F.aggregate(
        t,
        F.expr("CAST(array() AS array<string>)"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(pa))
            & (x == F.lit(pb)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(pa + pb))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def learn_bpe_merges(toks: DataFrame, n_merges: int) -> list[tuple[str, str]]:
    """Learn `n_merges` BPE merges over a token-array column `t`:
    each round takes the (count desc, pair asc)-max adjacent pair —
    ONE distributed job returning ONE row — applies `merge_pair_col`,
    and repeats. Model state on the driver is just the merge list."""
    merges: list[tuple[str, str]] = []
    cur = toks
    for _ in range(n_merges):
        top = (
            adjacent_pair_counts(cur)
            .orderBy(F.col("cnt").desc(), "pair")
            .limit(1)
            .collect()
        )
        if not top:
            break
        pa, pb = top[0]["pair"].split(" ", 1)
        merges.append((pa, pb))
        cur = cur.select(merge_pair_col(F.col("t"), pa, pb).alias("t"))
    return merges


def learn_bpe_merges_batched(
    toks: DataFrame,
    n_merges: int,
    batch: int = 8,
    _stats: dict | None = None,
) -> list[tuple[str, str]]:
    """Exact-parity batched BPE learning: identical merge list to
    `learn_bpe_merges`, but ONE distributed job can commit up to
    `batch` merges, so a 10k-merge vocabulary needs ~10k/batch jobs
    instead of 10k sequential ones (the round-4 scale flag).

    Why the batch is provably exact, not approximate: per round, one
    job collects the top `batch`+1 pairs under the canonical
    (count desc, pair asc) order. We accept a maximal PREFIX of that
    ranking that is pairwise symbol-disjoint — counting the merged
    concatenation pa+pb as an occupied symbol, since a later pair
    touching it would conflate pre-existing tokens spelled "pa+pb"
    with newly merged ones. Applying disjoint merges cannot change
    each other's counts, so each accepted pair still holds its rank
    when its turn comes. The only other competitors the exact
    algorithm could see at round j are pairs CREATED by earlier
    accepted merges, and any such pair (x, ab) satisfies
    count(x, ab) <= count(x, a); (x, a) shares symbol `a`, so it is
    outside the disjoint prefix and its count is <= the best
    non-accepted count `c_rest`. Trimming the batch to pairs with
    count strictly greater than `c_rest` (the first pair always
    stands) therefore guarantees no created pair can outrank any
    accepted one, and skipped existing pairs only ever lose count.
    Net: byte-identical merges to the job-per-merge path, by
    construction — and the parity test re-checks it empirically on
    the overlap-hazard corpora.
    """
    merges: list[tuple[str, str]] = []
    cur = toks
    jobs = 0
    while len(merges) < n_merges:
        top = (
            adjacent_pair_counts(cur)
            .orderBy(F.col("cnt").desc(), "pair")
            .limit(batch + 1)
            .collect()
        )
        jobs += 1
        if not top:
            break
        accepted: list[tuple[str, str, int]] = []
        used: set[str] = set()
        c_rest = 0
        for i, row in enumerate(top):
            pa, pb = row["pair"].split(" ", 1)
            if i >= batch or {pa, pb, pa + pb} & used:
                c_rest = int(row["cnt"])  # best pair we did NOT accept
                break
            accepted.append((pa, pb, int(row["cnt"])))
            used |= {pa, pb, pa + pb}
        # strict-dominance trim: pair j>1 must outrank anything a
        # prior merge could create (bounded by c_rest); ties go to
        # the single-merge path next round. Counts are non-increasing
        # along `accepted`, so the safe set is a contiguous prefix.
        take = accepted[:1]
        for t in accepted[1:]:
            if t[2] > c_rest:
                take.append(t)
            else:
                break
        take = take[: n_merges - len(merges)]
        out = F.col("t")
        for pa, pb, _ in take:
            merges.append((pa, pb))
            out = merge_pair_col(out, pa, pb)
        cur = cur.select(out.alias("t"))
    if _stats is not None:
        _stats["jobs"] = jobs
    return merges


def apply_bpe_merges(toks: DataFrame, merges: list[tuple[str, str]]) -> DataFrame:
    """Apply a learned merge list to a token-array column `t` in merge
    order (the BPE encode path): each merge folds into the SAME single
    projection — Catalyst composes the chained `aggregate` calls into
    one codegen'd expression, so encoding with an n-merge vocabulary
    is still ONE narrow scan, no shuffle, no Python."""
    out = F.col("t")
    for pa, pb in merges:
        out = merge_pair_col(out, pa, pb)
    return toks.withColumn("t", out)


# ---------------------------------------------------------------------------
# x17: temperature-scaled source mixing
# ---------------------------------------------------------------------------

_MIX_ALPHA_NUM, _MIX_ALPHA_DEN = 7, 10  # α = 0.7 as an exact rational


def x17_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled mixing (the multilingual-balancing staple:
    sampling probability ∝ n(s)^α with α = 0.7, so small sources are
    upweighted relative to their raw share without letting any source
    dominate). Unlike x10's externally-given weights, the weights here
    DERIVE from the observed size distribution — the self-balancing
    recipe of multilingual LLM corpora (mC4/XLM-R style).

    Same two-phase scale shape as x10: a |sources|-row count aggregate
    fixes rates driver-free (rate(s) = c · n(s)^α / n(s), scaled so
    the largest rate is 1); phase 2 is a shuffle-free md5-bucket keep.
    pow uses the exact rational exponent 7/10 in the SAME operation
    order in both engines, and rate comparisons quantize through
    round(·, 9) so an ulp of pow() divergence cannot flip a keep
    decision."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        (
            F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6), 16, 10).cast(
                "bigint"
            )
            % 1_000_000
        ).alias("b"),
    )
    n = d.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    # rate(s) ∝ n^(α-1); scale so max rate == 1 (the biggest source
    # keeps everything it can, smaller sources keep relatively more)
    pw = F.pow(F.col("n").cast("double"), F.lit(_MIX_ALPHA_NUM / _MIX_ALPHA_DEN) - 1)
    rated = n.withColumn("raw_rate", pw)
    mx = rated.agg(F.max("raw_rate").alias("mx"))
    rates = rated.crossJoin(F.broadcast(mx)).select(
        "source", "n", F.round(F.col("raw_rate") / F.col("mx"), 9).alias("keep_rate")
    )
    kept = F.when(F.col("b").cast("double") / F.lit(1000000.0) < F.col("keep_rate"), 1)
    return (
        d.join(F.broadcast(rates), "source")
        .groupBy("source")
        .agg(
            F.any_value("n").cast("long").alias("n_in"),
            F.count(kept).cast("long").alias("n_kept"),
            F.printf(F.lit("%.6f"), F.any_value("keep_rate")).alias("keep_rate"),
            F.sum(F.when(kept.isNotNull(), F.col("doc_id"))).cast("long").alias("id_checksum"),
        )
        .orderBy("source")
    )


X17_ORACLE = f"""
WITH d AS (
  SELECT doc_id, source,
         CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 6)) AS BIGINT) % 1000000 AS b
  FROM documents
), n AS (
  SELECT source, COUNT(*) AS n FROM d GROUP BY source
), rated AS (
  SELECT source, n, pow(CAST(n AS DOUBLE), {_MIX_ALPHA_NUM / _MIX_ALPHA_DEN} - 1) AS raw_rate
  FROM n
), m AS (SELECT MAX(raw_rate) AS mx FROM rated),
r AS (
  SELECT source, n, round(raw_rate / m.mx, 9) AS keep_rate FROM rated, m
)
SELECT d.source,
       CAST(ANY_VALUE(r.n) AS BIGINT) AS n_in,
       CAST(COUNT(CASE WHEN CAST(d.b AS DOUBLE)/1000000.0 < r.keep_rate THEN 1 END) AS BIGINT) AS n_kept,
       printf('%.6f', ANY_VALUE(r.keep_rate)) AS keep_rate,
       CAST(SUM(CASE WHEN CAST(d.b AS DOUBLE)/1000000.0 < r.keep_rate THEN d.doc_id END) AS BIGINT) AS id_checksum
FROM d JOIN r ON r.source = d.source
GROUP BY d.source ORDER BY d.source
"""


# ---------------------------------------------------------------------------
# x18: Gopher-style document quality filter battery
# ---------------------------------------------------------------------------

# Rae et al. 2021 ("Scaling Language Models: ... Gopher") §A1.1 rules,
# restricted to the ones expressible identically in both engines
_G_MIN_WORDS, _G_MAX_WORDS = 15, 100_000
_G_MIN_MWL, _G_MAX_MWL = 3.0, 10.0   # mean word length bounds
_G_MIN_ALPHA = 0.8                   # fraction of words w/ an alphabetic char
_G_STOPWORDS = ("the", "a", "and", "of", "to", "in")
_G_MIN_STOP = 2                      # distinct stopwords required


def x18_gopher_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Gopher quality-filter battery (Rae et al. 2021, the
    standard pre-training doc screen): word-count bounds, mean-word-
    length bounds, alphabetic-word fraction, and distinct-stopword
    presence — evaluated per document in ONE narrow projection of
    pyspark.sql.functions built-ins (no UDF), rolled up to per-source
    pass / per-rule-failure counts.

    Scale shape: a single scan + one |sources|-group aggregate; every
    metric is a whole-stage-codegen'd expression over the token array
    (size/filter/array_intersect), so the filter runs at scan speed —
    exactly how a 100-TB quality screen must behave. Failure counts
    are reported PER RULE (not just the conjunction) because at
    curation time you tune thresholds rule-by-rule.
    """
    d = load_table(spark, sf_dir, "documents")
    t = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    n_words = F.size(t)
    n_nospace = F.length(F.regexp_replace(F.col("text"), r"\s+", ""))
    mwl = n_nospace / n_words
    alpha_frac = F.size(F.filter(t, lambda w: w.rlike("[a-z]"))) / n_words
    n_stop = F.size(F.array_intersect(t, F.array(*[F.lit(s) for s in _G_STOPWORDS])))
    m = d.select(
        "source",
        ((n_words >= _G_MIN_WORDS) & (n_words <= _G_MAX_WORDS)).alias("ok_words"),
        ((mwl >= _G_MIN_MWL) & (mwl <= _G_MAX_MWL)).alias("ok_mwl"),
        (alpha_frac >= _G_MIN_ALPHA).alias("ok_alpha"),
        (n_stop >= _G_MIN_STOP).alias("ok_stop"),
    ).select(
        "source",
        "ok_words",
        "ok_mwl",
        "ok_alpha",
        "ok_stop",
        (F.col("ok_words") & F.col("ok_mwl") & F.col("ok_alpha") & F.col("ok_stop")).alias(
            "ok_all"
        ),
    )
    fail = lambda c: F.sum(F.when(~F.col(c), 1).otherwise(0))  # noqa: E731
    return (
        m.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("ok_all"), 1).otherwise(0)).alias("n_pass"),
            fail("ok_words").alias("fail_words"),
            fail("ok_mwl").alias("fail_mwl"),
            fail("ok_alpha").alias("fail_alpha"),
            fail("ok_stop").alias("fail_stop"),
        )
        .orderBy("source")
    )


X18_ORACLE = f"""
WITH m AS (
  SELECT source,
         len(string_split_regex(trim(lower(text)), '\\s+')) AS n_words,
         length(regexp_replace(text, '\\s+', '', 'g')) AS n_nospace,
         len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                         w -> regexp_matches(w, '[a-z]'))) AS n_alpha,
         len(list_intersect(string_split_regex(trim(lower(text)), '\\s+'),
                            {list(_G_STOPWORDS)})) AS n_stop
  FROM documents
), ok AS (
  SELECT source,
         n_words BETWEEN {_G_MIN_WORDS} AND {_G_MAX_WORDS} AS ok_words,
         CAST(n_nospace AS DOUBLE)/n_words BETWEEN {_G_MIN_MWL} AND {_G_MAX_MWL} AS ok_mwl,
         CAST(n_alpha AS DOUBLE)/n_words >= {_G_MIN_ALPHA} AS ok_alpha,
         n_stop >= {_G_MIN_STOP} AS ok_stop
  FROM m
)
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN ok_words AND ok_mwl AND ok_alpha AND ok_stop THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
       CAST(SUM(CASE WHEN NOT ok_words THEN 1 ELSE 0 END) AS BIGINT) AS fail_words,
       CAST(SUM(CASE WHEN NOT ok_mwl THEN 1 ELSE 0 END) AS BIGINT) AS fail_mwl,
       CAST(SUM(CASE WHEN NOT ok_alpha THEN 1 ELSE 0 END) AS BIGINT) AS fail_alpha,
       CAST(SUM(CASE WHEN NOT ok_stop THEN 1 ELSE 0 END) AS BIGINT) AS fail_stop
FROM ok GROUP BY source ORDER BY source
"""


# ---------------------------------------------------------------------------
# x19: bigram language-model training (conditional next-token table)
# ---------------------------------------------------------------------------

_LM_TOP_CTX = 10
_LM_TOP_NEXT = 3


def x19_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train a bigram LM over the corpus: count adjacent token pairs,
    normalize into conditional probabilities P(next | context), and
    emit the top-3 next tokens for the 10 highest-mass contexts —
    the training half of the n-gram pipeline whose *scoring* half is
    i2's perplexity filter (`sampling.py`), and the classic
    KenLM-style count/normalize shape.

    Spark-first: bigrams come from zipping each token array with its
    own tail (`slice(t,1,n-1)` × `slice(t,2,n-1)` — one narrow
    Generate, no self-join on token position), pair counts shuffle
    once on (context, next) and are vocabulary²-bounded (sub-linear
    in corpus size), context totals and both rank windows run on the
    counts table, never the corpus. At 100 TB the only corpus-sized
    stage is the map-side explode feeding a partial-aggregated
    count — the canonical word-count shape.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+").alias("t")
    )
    bg = (
        toks.select(
            F.explode(
                F.arrays_zip(
                    F.expr("slice(t, 1, size(t) - 1)").alias("w1"),
                    F.expr("slice(t, 2, size(t) - 1)").alias("w2"),
                )
            ).alias("bg")
        )
        .select(F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
        .filter((F.col("w1") != "") & (F.col("w2") != ""))
    )
    cnt = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c"))
    tot = cnt.groupBy("w1").agg(F.sum("c").alias("tc"))
    # top contexts via orderBy+limit — Spark plans TakeOrderedAndProject
    # (per-partition top-k, merged on the driver), NOT a
    # single-partition global window: at web scale the vocabulary is
    # 10^7-10^9 contexts and an un-partitioned row_number would funnel
    # all of it through one task (the g3 round-5 lesson)
    ctx = tot.orderBy(F.desc("tc"), F.asc("w1")).limit(_LM_TOP_CTX)
    wn = Window.partitionBy("w1").orderBy(F.desc("c"), F.asc("w2"))
    return (
        cnt.join(F.broadcast(ctx.select("w1", "tc")), "w1")
        .withColumn("r", F.row_number().over(wn))
        .filter(F.col("r") <= _LM_TOP_NEXT)
        .select(
            F.col("w1").alias("context"),
            F.col("w2").alias("next_token"),
            F.col("c").alias("n_pair"),
            F.round(F.col("c") / F.col("tc"), 6).alias("prob"),
            F.col("r").cast("int").alias("rank"),
        )
        .orderBy("context", "rank")
    )


X19_ORACLE = f"""
WITH toks AS (
  SELECT string_split_regex(trim(lower(text)), '\\s+') AS t FROM documents
), bg AS (
  SELECT unnest(list_slice(t, 1, len(t) - 1)) AS w1,
         unnest(list_slice(t, 2, len(t))) AS w2
  FROM toks
), cnt AS (
  SELECT w1, w2, COUNT(*) AS c FROM bg
  WHERE w1 <> '' AND w2 <> '' GROUP BY w1, w2
), tot AS (
  SELECT w1, SUM(c) AS tc FROM cnt GROUP BY w1
), ctx AS (
  SELECT w1, tc FROM tot ORDER BY tc DESC, w1 ASC LIMIT {_LM_TOP_CTX}
), ranked AS (
  SELECT c.w1, c.w2, c.c, x.tc,
         ROW_NUMBER() OVER (PARTITION BY c.w1 ORDER BY c.c DESC, c.w2 ASC) AS r
  FROM cnt c JOIN ctx x USING (w1)
)
SELECT w1 AS context, w2 AS next_token, CAST(c AS BIGINT) AS n_pair,
       ROUND(CAST(c AS DOUBLE) / tc, 6) AS prob, CAST(r AS INT) AS rank
FROM ranked WHERE r <= {_LM_TOP_NEXT} ORDER BY context, rank
"""


# ---------------------------------------------------------------------------
# x20: vocabulary growth curve (Heaps-law corpus diagnostic)
# ---------------------------------------------------------------------------

_VG_BUCKETS = 10


def x20_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary growth curve: how many NEW distinct tokens each
    successive tenth of the corpus contributes, plus the cumulative
    vocabulary — the Heaps-law diagnostic curation teams read before
    sizing tokenizers and dedup thresholds (a corpus whose curve
    doesn't flatten is unbounded-vocabulary trouble: boilerplate IDs,
    serial numbers, encoding noise).

    Spark-first: 'first decile a token appears in' is min(doc_id) per
    token — ONE shuffle on the token (d8's first-occurrence pattern,
    partial-aggregatable, hot tokens collapse map-side); the decile
    histogram is 10 rows and the cumulative sum is a window over
    those 10 rows, not the corpus. The doc count comes from a
    metadata count. Deterministic integer arithmetic throughout.
    """
    d = load_table(spark, sf_dir, "documents")
    n_docs = d.count()  # parquet metadata count
    toks = d.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("w"),
    ).filter(F.col("w") != "")
    first = toks.groupBy("w").agg(F.min("doc_id").alias("first_doc"))
    decile = F.least(
        F.lit(_VG_BUCKETS - 1),
        F.floor(F.col("first_doc") * _VG_BUCKETS / F.lit(n_docs)),
    ).cast("int")
    hist = first.groupBy(decile.alias("decile")).agg(
        F.count(F.lit(1)).alias("new_tokens")
    )
    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    # the cumulative window runs over <= 10 rows — not a corpus sort
    return (
        hist.withColumn("cumulative_vocab", F.sum("new_tokens").over(w))
        .select("decile", "new_tokens", "cumulative_vocab")
        .orderBy("decile")
    )


X20_ORACLE = f"""
WITH n AS (SELECT COUNT(*) AS n_docs FROM documents),
toks AS (
  SELECT doc_id, u.w FROM documents,
         LATERAL unnest(string_split_regex(trim(lower(text)), '\\s+')) AS u(w)
  WHERE u.w <> ''
), first AS (
  SELECT w, MIN(doc_id) AS first_doc FROM toks GROUP BY w
), hist AS (
  SELECT CAST(LEAST({_VG_BUCKETS - 1},
                    FLOOR(first_doc * {_VG_BUCKETS} / n.n_docs)) AS INT) AS decile,
         COUNT(*) AS new_tokens
  FROM first, n GROUP BY 1
)
SELECT decile, new_tokens,
       CAST(SUM(new_tokens) OVER (ORDER BY decile
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cumulative_vocab
FROM hist ORDER BY decile
"""


# ---------------------------------------------------------------------------
# x21: pairwise source-distribution divergence (exact rational arithmetic)
# ---------------------------------------------------------------------------


def x21_source_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise TOTAL-VARIATION distance between per-source unigram
    distributions plus vocabulary Jaccard — the domain-shift matrix a
    curation team reads before mixing sources (x10's mix tells you the
    proportions; this tells you how far apart the sources actually
    are, the input to reweighting decisions like DoReMi-style domain
    weights).

    Engine-exactness design: KL/JS divergence needs ln on
    data-dependent ratios, and libm differs across engines by 1 ulp —
    unhashable. TV distance needs only |pa - pb| sums, which reduce to
    EXACT integer arithmetic over a common denominator:
      TV = (A + 2*na*nb - B - C) / (2*na*nb), where
      A = sum over shared tokens |ca*nb - cb*na|,
      B = sum ca*nb, C = sum cb*na  (shared tokens only)
    — the two one-sided tails (tokens unique to a side) are recovered
    algebraically from B and C, so an INNER join on the token suffices
    (no outer-join null handling). Sums accumulate as DECIMAL(38,0) /
    HUGEINT (overflow-proof at any corpus size); the only float op is
    one final division of identical operands. Round 6, hash-graded.

    Scale shape: unigram counts are the canonical word-count (one
    corpus-sized shuffle with map-side partials onto vocab × sources
    rows); the pair join keys on the TOKEN (vocab-bounded, never
    corpus-bounded) and fans out at most (#sources choose 2) rows per
    token; totals ride along via a broadcast join. Output is
    #source-pairs rows.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "source",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("w"),
    ).filter(F.col("w") != "")
    # vocab×sources-sized (NOT corpus-sized): materialize once so the
    # a/b pair branches and the totals don't each re-scan the corpus —
    # the same model-state-only materialization rule as d2/g3
    cnt = (
        toks.groupBy("source", "w")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=True)
    )
    tot = cnt.groupBy("source").agg(
        F.sum("c").alias("n"), F.count(F.lit(1)).alias("v")
    )
    e = cnt.join(F.broadcast(tot), "source")
    a = e.select(
        F.col("source").alias("sa"), "w", F.col("c").alias("ca"),
        F.col("n").alias("na"), F.col("v").alias("va"),
    )
    b = e.select(
        F.col("source").alias("sb"), "w", F.col("c").alias("cb"),
        F.col("n").alias("nb"), F.col("v").alias("vb"),
    )
    pairs = a.join(b, "w").filter(F.col("sa") < F.col("sb"))
    agg = pairs.groupBy("sa", "sb", "na", "nb", "va", "vb").agg(
        F.expr(
            "CAST(sum(abs(CAST(ca AS DECIMAL(38,0)) * nb"
            " - CAST(cb AS DECIMAL(38,0)) * na)) AS DECIMAL(38,0))"
        ).alias("ta"),
        F.expr("CAST(sum(CAST(ca AS DECIMAL(38,0)) * nb) AS DECIMAL(38,0))").alias("tb"),
        F.expr("CAST(sum(CAST(cb AS DECIMAL(38,0)) * na) AS DECIMAL(38,0))").alias("tc"),
        F.count(F.lit(1)).alias("inter"),
    )
    return agg.select(
        F.col("sa").alias("source_a"),
        F.col("sb").alias("source_b"),
        F.col("inter").alias("vocab_overlap"),
        F.round(
            F.col("inter") / (F.col("va") + F.col("vb") - F.col("inter")), 6
        ).alias("jaccard"),
        F.expr(
            "round(CAST(ta + 2 * CAST(na AS DECIMAL(38,0)) * nb - tb - tc AS DOUBLE)"
            " / CAST(2 * CAST(na AS DECIMAL(38,0)) * nb AS DOUBLE), 6)"
        ).alias("tv_distance"),
    ).orderBy("source_a", "source_b")


X21_ORACLE = """
WITH toks AS (
  SELECT source, u.w
  FROM documents,
       LATERAL unnest(string_split_regex(trim(lower(text)), '\\s+')) AS u(w)
  WHERE u.w <> ''
), cnt AS (
  SELECT source, w, COUNT(*) AS c FROM toks GROUP BY source, w
), tot AS (
  SELECT source, CAST(SUM(c) AS BIGINT) AS n, COUNT(*) AS v
  FROM cnt GROUP BY source
), e AS (
  SELECT c.source, c.w, c.c, t.n, t.v FROM cnt c JOIN tot t USING (source)
), p AS (
  SELECT a.source AS source_a, b.source AS source_b,
         ANY_VALUE(a.n) AS na, ANY_VALUE(b.n) AS nb,
         ANY_VALUE(a.v) AS va, ANY_VALUE(b.v) AS vb,
         SUM(ABS(CAST(a.c AS HUGEINT) * b.n - CAST(b.c AS HUGEINT) * a.n)) AS ta,
         SUM(CAST(a.c AS HUGEINT) * b.n) AS tb,
         SUM(CAST(b.c AS HUGEINT) * a.n) AS tc,
         COUNT(*) AS inter
  FROM e a JOIN e b ON a.w = b.w AND a.source < b.source
  GROUP BY a.source, b.source
)
SELECT source_a, source_b, CAST(inter AS BIGINT) AS vocab_overlap,
       ROUND(CAST(inter AS DOUBLE) / (va + vb - inter), 6) AS jaccard,
       ROUND(CAST(ta + 2 * CAST(na AS HUGEINT) * nb - tb - tc AS DOUBLE)
             / CAST(2 * CAST(na AS HUGEINT) * nb AS DOUBLE), 6) AS tv_distance
FROM p ORDER BY source_a, source_b
"""


# ---------------------------------------------------------------------------
# x22: n-gram novelty score — per-source share of never-seen-before
# shingles (the marginal-information diagnostic behind dedup budgets)
# ---------------------------------------------------------------------------

_NOV_N = 5  # shingle width, matches d13/d14's window granularity


def x22_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source n-gram NOVELTY: of each document's distinct 5-token
    shingles, what fraction occurs for the first time in the corpus
    (first occurrence = the smallest doc_id containing the shingle —
    the deterministic stand-in for arrival order)? Curation teams read
    this before spending dedup budget: a source whose marginal docs
    are mostly already-seen shingles (templated pages, mirrored
    content) gets deduped or down-sampled first, and the novelty
    trend is the stop signal for crawl expansion (the "data wall"
    measurement of Villalobos et al., 'Will we run out of data?').

    Output per source: doc count, mean per-doc novelty ratio,
    fraction of fully-novel docs (ratio = 1), and pooled shingle
    totals. The per-doc ratio is QUANTIZED to integer parts-per-
    million (floor(n_novel·1e6 / n_shingles), the identical IEEE
    mul-div-floor in both engines) before averaging, and the mean is
    one cast-then-divide over the exact BIGINT ppm sum — a bare
    AVG over per-doc double ratios would be a partition-order-
    dependent float accumulation (the a8 rule) and could flip the
    6th rounded decimal between engines or even between runs.

    Scale shape: the shingle explode is narrow; first-occurrence is
    min(doc_id) per shingle — ONE corpus-sized shuffle that partial
    aggregation collapses map-side (x20's Heaps-curve shape, d8's
    first-occurrence pattern). The mark-back rides the SAME
    hash-partitioned key (shingle), so AQE plans shuffle-reuse, and
    per-doc / per-source rollups are plain partial aggs. The wide
    text column is dropped at the explode; only 128-bit shingle
    hashes ride shuffles (d13's rule, operators/dedup.py).
    """
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        "source",
        F.split(F.trim(F.lower(F.col("text"))), r"\s+").alias("t"),
    )
    sh = (
        toks.select(
            "doc_id",
            "source",
            F.explode(
                F.expr(
                    f"transform(sequence(0, greatest(size(t) - {_NOV_N}, 0)),"
                    f" i -> md5(concat_ws(' ', slice(t, i+1, {_NOV_N}))))"
                )
            ).alias("h"),
        )
        .distinct()  # per-doc distinct shingles
    )
    first = sh.groupBy("h").agg(F.min("doc_id").alias("first_doc"))
    marked = sh.join(first, "h").select(
        "doc_id",
        "source",
        (F.col("doc_id") == F.col("first_doc")).cast("int").alias("novel"),
    )
    per_doc = marked.groupBy("doc_id", "source").agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.sum("novel").alias("n_novel"),
    ).withColumn(
        "novelty_ppm",
        F.floor(
            F.col("n_novel") * F.lit(1000000.0) / F.col("n_shingles")
        ).cast("bigint"),
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(
                F.sum("novelty_ppm").cast("double")
                / F.count(F.lit(1)).cast("double")
                / 1000000.0,
                6,
            ).alias("mean_novelty"),
            F.round(
                F.avg((F.col("n_novel") == F.col("n_shingles")).cast("int")), 6
            ).alias("fully_novel_frac"),
            F.sum("n_shingles").alias("total_shingles"),
            F.sum("n_novel").alias("total_novel"),
        )
        .orderBy("source")
    )


X22_ORACLE = f"""
WITH t AS MATERIALIZED (
  SELECT doc_id, source, string_split_regex(trim(lower(text)), '\\s+') AS l
  FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, source,
         md5(array_to_string(l[u.i+1 : u.i+{_NOV_N}], ' ')) AS h
  FROM t, LATERAL (
    SELECT unnest(range(0, GREATEST(len(l) - {_NOV_N}, 0) + 1)) AS i
  ) u
),
first AS (
  SELECT h, MIN(doc_id) AS first_doc FROM sh GROUP BY h
),
per_doc AS (
  SELECT sh.doc_id, sh.source,
         COUNT(*) AS n_shingles,
         SUM(CASE WHEN sh.doc_id = f.first_doc THEN 1 ELSE 0 END) AS n_novel
  FROM sh JOIN first f ON f.h = sh.h
  GROUP BY sh.doc_id, sh.source
),
ppm AS (
  SELECT source, n_shingles, n_novel,
         CAST(FLOOR(CAST(n_novel AS DOUBLE) * 1000000.0 / n_shingles) AS BIGINT)
           AS novelty_ppm
  FROM per_doc
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(CAST(SUM(novelty_ppm) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
             / 1000000.0, 6) AS mean_novelty,
       ROUND(AVG(CASE WHEN n_novel = n_shingles THEN 1.0 ELSE 0.0 END), 6) AS fully_novel_frac,
       CAST(SUM(n_shingles) AS BIGINT) AS total_shingles,
       CAST(SUM(n_novel) AS BIGINT) AS total_novel
FROM ppm GROUP BY source ORDER BY source
"""


# ---------------------------------------------------------------------------
# x23: BM25 lexical retrieval (Okapi BM25, k1=1.2, b=0.75)
# ---------------------------------------------------------------------------

_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TOPK = 5
# (query_id, query text) — terms drawn from the synthetic corpus vocab
_BM25_QUERIES = [
    (1, "fast hash join"),
    (2, "window agg stream"),
    (3, "customer order big table"),
]


def bm25_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 candidate scores (query_id, doc_id, score_ppm,
    n_terms_hit) for `_BM25_QUERIES` — the shared scoring stage of
    x23's top-k and v9's hybrid RRF fusion. See x23_bm25_topk for the
    formula, determinism, and scale notes."""
    qterms = spark.createDataFrame(
        sorted({(qid, t) for qid, q in _BM25_QUERIES for t in q.split(" ")}),
        "query_id int, term string",
    )
    d = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select(
            "doc_id",
            F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z]+"), 0).alias(
                "terms"
            ),
        )
        .withColumn("dl", F.size("terms"))
    )
    corpus = d.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    posting = (
        d.select("doc_id", "dl", F.explode("terms").alias("term"))
        .join(F.broadcast(qterms.select("term").distinct()), "term")
    )
    tf = posting.groupBy("term", "doc_id", "dl").agg(
        F.count(F.lit(1)).alias("tf")
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    k1, b = F.lit(_BM25_K1), F.lit(_BM25_B)
    term_scores = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(corpus))
        .withColumn(
            "idf",
            F.ln(
                (F.col("n_docs") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
                + F.lit(1.0)
            ),
        )
        .withColumn(
            "tfn",
            F.col("tf")
            * (k1 + F.lit(1.0))
            / (
                F.col("tf")
                + k1 * (F.lit(1.0) - b + b * F.col("dl") / F.col("avgdl"))
            ),
        )
        .withColumn(
            "term_ppm",
            F.round(F.col("idf") * F.col("tfn") * F.lit(1000000.0), 0).cast(
                "bigint"
            ),
        )
    )
    return (
        term_scores.join(F.broadcast(qterms), "term")
        .groupBy("query_id", "doc_id")
        .agg(
            F.sum("term_ppm").alias("score_ppm"),
            F.count(F.lit(1)).alias("n_terms_hit"),
        )
    )


def x23_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-k retrieval over the documents corpus — the
    lexical half of a retrieval stack (the dense half is v1-v7):
    score(D,Q) = sum_t idf(t) * tf*(k1+1) / (tf + k1*(1-b+b*|D|/avgdl)),
    idf(t) = ln((N - df + 0.5)/(df + 0.5) + 1)  [the +1 Lucene variant,
    always positive]. k1=1.2, b=0.75, k=5 per query.

    Cross-engine exactness: each TERM's contribution is quantized to
    ppm (round(idf*tfn*1e6) as bigint) BEFORE summing, so the final
    score is an order-independent integer sum and ranking ties break
    on (score_ppm desc, doc_id asc) — no float-sum nondeterminism.

    Scale: the explode is filtered by a BROADCAST of the query
    vocabulary before any shuffle, so the posting shuffle carries only
    query-term hits (|Q_vocab|/|corpus_vocab| of the token mass); df
    and the corpus stats (N, avgdl) are tiny broadcast sides; the
    per-query top-k window partitions by query_id over the candidate
    set only. At 100 TB the one full-width pass is the tokenize scan —
    exactly the cost floor of lexical retrieval without a prebuilt
    inverted index (x13's tf/df shape IS that index build)."""
    scores = bm25_scores(spark, sf_dir)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score_ppm"), F.asc("doc_id")
    )
    return (
        scores.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _BM25_TOPK)
        .select("query_id", "rk", "doc_id", "score_ppm", "n_terms_hit")
        .orderBy("query_id", "rk")
    )


_BM25_Q_VALUES = ", ".join(f"({qid}, '{q}')" for qid, q in _BM25_QUERIES)

# the CTE chain up to `scores` (query_id, doc_id, score_ppm,
# n_terms_hit) — shared between X23_ORACLE and similarity.V9_ORACLE,
# mirroring the bm25_scores / x23_bm25_topk split on the Spark side
BM25_SCORES_CTE = f"""q(query_id, qtext) AS (VALUES {_BM25_Q_VALUES}),
qt AS (
  SELECT DISTINCT query_id, unnest(string_split(qtext, ' ')) AS term FROM q
),
docs AS MATERIALIZED (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS terms
  FROM documents WHERE text IS NOT NULL
),
dstat AS (SELECT doc_id, len(terms) AS dl FROM docs),
corpus AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM dstat),
posting AS (
  SELECT d.doc_id, unnest(d.terms) AS term FROM docs d
),
tf AS (
  SELECT p.term, p.doc_id, s.dl, COUNT(*) AS tf
  FROM posting p
  JOIN (SELECT DISTINCT term FROM qt) v USING (term)
  JOIN dstat s USING (doc_id)
  GROUP BY p.term, p.doc_id, s.dl
),
dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
term_scores AS (
  SELECT tf.term, tf.doc_id,
         CAST(ROUND(
           ln((c.n_docs - f.df + 0.5) / (f.df + 0.5) + 1.0)
           * (tf.tf * ({_BM25_K1} + 1.0)
              / (tf.tf + {_BM25_K1}
                 * (1.0 - {_BM25_B} + {_BM25_B} * tf.dl / c.avgdl)))
           * 1000000.0, 0) AS BIGINT) AS term_ppm
  FROM tf JOIN dfreq f USING (term) CROSS JOIN corpus c
),
scores AS (
  SELECT qt.query_id, ts.doc_id,
         SUM(ts.term_ppm) AS score_ppm, COUNT(*) AS n_terms_hit
  FROM term_scores ts JOIN qt USING (term)
  GROUP BY qt.query_id, ts.doc_id
)"""

X23_ORACLE = f"""
WITH {BM25_SCORES_CTE},
ranked AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY score_ppm DESC, doc_id ASC) AS rk
  FROM scores
)
SELECT query_id, CAST(rk AS INT) AS rk, doc_id,
       CAST(score_ppm AS BIGINT) AS score_ppm,
       CAST(n_terms_hit AS BIGINT) AS n_terms_hit
FROM ranked WHERE rk <= {_BM25_TOPK}
ORDER BY query_id, rk
"""
