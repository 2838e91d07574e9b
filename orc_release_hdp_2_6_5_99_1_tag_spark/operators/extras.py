"""Additional operator coverage: exact percentiles, string-pattern
filters (LIKE pushdown), anti/semi joins (blocklist filtering — a
standard training-data pipeline step), and a vectorized pandas UDF
with built-in-function parity (the §2.12 UDF surface).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from orc_release_hdp_2_6_5_99_1_tag_spark.tables import load_table


def a7_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark `percentile` ⇔ DuckDB
    `quantile_cont`) per return flag. Exact — not approx — so the
    oracle matches; the approx scale path is percentile_approx with
    identical call shape."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_returnflag")
        .agg(
            F.round(F.expr("percentile(l_extendedprice, 0.5)"), 6).alias("p50_price"),
            F.round(F.expr("percentile(l_extendedprice, 0.95)"), 6).alias("p95_price"),
            F.round(F.expr("percentile(l_quantity, 0.25)"), 6).alias("p25_qty"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("l_returnflag")
    )


A7_ORACLE = """
SELECT l_returnflag,
       ROUND(quantile_cont(l_extendedprice, 0.5), 6) AS p50_price,
       ROUND(quantile_cont(l_extendedprice, 0.95), 6) AS p95_price,
       ROUND(quantile_cont(l_quantity, 0.25), 6) AS p25_qty,
       COUNT(*) AS n
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


def f9_string_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-pattern predicates: LIKE prefix/suffix/infix (prefix
    compiles to StartsWith and pushes to the scan), and RLIKE regexp."""
    p = load_table(spark, sf_dir, "part")
    return p.agg(
        F.count(F.when(F.col("p_type").like("PROMO%"), 1)).alias("n_prefix"),
        F.count(F.when(F.col("p_type").like("%BRUSHED%"), 1)).alias("n_infix"),
        F.count(F.when(F.col("p_name").like("%_5"), 1)).alias("n_suffix_wild"),
        F.count(F.when(F.col("p_brand").rlike("^Brand_[12]$"), 1)).alias("n_regex"),
        F.count(F.lit(1)).alias("n_rows"),
    )


F9_ORACLE = """
SELECT COUNT(CASE WHEN p_type LIKE 'PROMO%' THEN 1 END) AS n_prefix,
       COUNT(CASE WHEN p_type LIKE '%BRUSHED%' THEN 1 END) AS n_infix,
       COUNT(CASE WHEN p_name LIKE '%_5' THEN 1 END) AS n_suffix_wild,
       COUNT(CASE WHEN regexp_matches(p_brand, '^Brand_[12]$') THEN 1 END) AS n_regex,
       COUNT(*) AS n_rows
FROM part
"""


def d5_blocklist_antijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocklist filtering (anti join) + allowlist check (semi join) —
    the dedup-against-known-bad pattern. The blocklist is derived
    deterministically (sources ending in 0/5 are 'blocked'); broadcast
    as the small side."""
    d = load_table(spark, sf_dir, "documents")
    blocklist = (
        d.select("source").distinct().filter(F.col("source").rlike("[05]$"))
    )
    kept = d.join(F.broadcast(blocklist), "source", "left_anti")
    blocked = d.join(F.broadcast(blocklist), "source", "left_semi")
    return kept.agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("doc_id").alias("kept_checksum"),
    ).crossJoin(
        blocked.agg(
            F.count(F.lit(1)).alias("n_blocked"),
            F.sum("doc_id").alias("blocked_checksum"),
        )
    )


D5_ORACLE = """
SELECT
  (SELECT COUNT(*) FROM documents WHERE NOT regexp_matches(source, '[05]$')) AS n_kept,
  (SELECT CAST(SUM(doc_id) AS BIGINT) FROM documents WHERE NOT regexp_matches(source, '[05]$')) AS kept_checksum,
  (SELECT COUNT(*) FROM documents WHERE regexp_matches(source, '[05]$')) AS n_blocked,
  (SELECT CAST(SUM(doc_id) AS BIGINT) FROM documents WHERE regexp_matches(source, '[05]$')) AS blocked_checksum
"""


def u2_pandas_udf_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.12 UDF surface: an Arrow-vectorized scalar pandas UDF (digit
    ratio per document) whose result is also derivable with built-in
    functions — demonstrating the UDF infrastructure with an oracle.
    The UDF is a closure (workers lack the repo on sys.path)."""
    from pyspark.sql.functions import pandas_udf

    # no type hints: `from __future__ import annotations` stringifies
    # them, which pandas_udf cannot introspect; hint-less defaults to
    # the SCALAR (Arrow-batched Series -> Series) eval type
    @pandas_udf("double")
    def digit_ratio(texts):
        return texts.str.count(r"\d") / texts.str.len()

    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.round(digit_ratio(F.col("text")), 6).alias("digit_ratio"),
    ).orderBy("doc_id")


U2_ORACLE = """
SELECT doc_id,
       ROUND(CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE) / length(text), 6) AS digit_ratio
FROM documents ORDER BY doc_id
"""


_U3_BUCKETS = 64
_U3_BIAS = 7
_U3_THRESHOLD = 40_000


def _u3_weights() -> list[int]:
    """Deterministic integer 'model' weights: bucket i's weight is the
    first 4 hex chars of md5(str(i)) mod 1000. Integer arithmetic end
    to end so Spark and the oracle agree exactly (no libm sigmoid)."""
    import hashlib

    return [
        int(hashlib.md5(str(i).encode()).hexdigest()[:4], 16) % 1000
        for i in range(_U3_BUCKETS)
    ]


def u3_model_inference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model inference at scale — the quality-classifier scoring pass a
    training pipeline runs over every document: a 64-bucket linear
    model whose weight vector ships to executors inside the pandas-UDF
    closure (the broadcast-weights pattern; a real model rides the same
    path as a numpy array / ONNX session per worker). Each Arrow batch
    hashes tokens to buckets (md5, oracle-replicable) and accumulates
    integer weights with numpy — no per-row Python round trips.

    The oracle replays the identical model relationally: explode
    tokens, join the 64-row weight table, sum. Per-source rollup plus
    a threshold classification count. Tokenization is pinned to ASCII
    whitespace on BOTH sides (Python's default str.split honors
    Unicode whitespace, DuckDB's RE2 \\s does not); a document with no
    tokens (NULL/empty text) scores exactly `bias` on both sides."""
    import hashlib
    import re

    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    w = np.array(_u3_weights(), dtype=np.int64)
    bias = _U3_BIAS
    token_re = re.compile(r"[^ \t\n\r\f\v]+")

    @pandas_udf("bigint")
    def score(texts):
        out = np.empty(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            toks = token_re.findall(t) if t else []
            idx = np.fromiter(
                (
                    int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % _U3_BUCKETS
                    for tok in toks
                ),
                dtype=np.int64,
                count=len(toks),
            )
            out[i] = bias + int(w[idx].sum())
        return pd.Series(out)

    d = load_table(spark, sf_dir, "documents")
    scored = d.select("doc_id", "source", score(F.col("text")).alias("s"))
    return (
        scored.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("s").alias("score_sum"),
            F.sum((F.col("s") > _U3_THRESHOLD).cast("int")).alias("n_positive"),
        )
        .orderBy("source")
    )


_U3_WEIGHT_ROWS = ", ".join(f"({i}, {wv})" for i, wv in enumerate(_u3_weights()))

U3_ORACLE = f"""
WITH weights(bucket, w) AS (VALUES {_U3_WEIGHT_ROWS}),
toks AS (
  SELECT doc_id,
         CAST(concat('0x', substr(md5(u.tok), 1, 8)) AS BIGINT) % {_U3_BUCKETS} AS bucket
  FROM documents, LATERAL (
    SELECT unnest(string_split_regex(text, '[ \\t\\n\\r\\f\\v]+')) AS tok
  ) u
  WHERE u.tok <> ''
), tok_scores AS (
  SELECT t.doc_id, SUM(w.w) AS tw
  FROM toks t JOIN weights w ON w.bucket = t.bucket
  GROUP BY t.doc_id
), scored AS (
  SELECT d.source, {_U3_BIAS} + COALESCE(ts.tw, 0) AS s
  FROM documents d LEFT JOIN tok_scores ts ON ts.doc_id = d.doc_id
)
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(s) AS BIGINT) AS score_sum,
       CAST(SUM(CASE WHEN s > {_U3_THRESHOLD} THEN 1 ELSE 0 END) AS BIGINT) AS n_positive
FROM scored GROUP BY source ORDER BY source
"""


def u4_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow — the last of Spark's Python-exchange shapes next to
    the pandas trio (u2), mapInPandas (m1), applyInPandas (m2), and
    the stateful pair (r3/r9): the UDF receives raw
    pyarrow.RecordBatch objects, so there is NO pandas conversion at
    all — the fastest Python lane for columnar-native logic
    (tokenizers, Arrow-compute kernels, FFI hand-off). Here a
    pyarrow.compute pipeline counts whitespace tokens and utf8 bytes
    per document; the rollup must match the pure-SQL oracle exactly.

    The closure captures nothing but pyarrow (imported inside — the
    executor has no repo on its import path under the external
    driver's vanilla session).
    """
    d = load_table(spark, sf_dir, "documents")

    def arrow_tokens(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        for batch in batches:
            text = batch.column(batch.schema.get_field_index("text"))
            toks = pc.list_value_length(
                pc.split_pattern_regex(pc.utf8_trim_whitespace(text), r"\s+")
            )
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column(batch.schema.get_field_index("doc_id")),
                    batch.column(batch.schema.get_field_index("source")),
                    toks.cast(pa.int64()),
                    pc.binary_length(text).cast(pa.int64()),
                ],
                names=["doc_id", "source", "n_tokens", "n_bytes"],
            )

    feats = d.select("doc_id", "source", "text").mapInArrow(
        arrow_tokens, "doc_id bigint, source string, n_tokens bigint, n_bytes bigint"
    )
    return (
        feats.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.sum("n_bytes").alias("total_bytes"),
            F.max("n_tokens").alias("max_tokens"),
        )
        .orderBy("source")
    )


U4_ORACLE = """
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT) AS total_tokens,
       CAST(SUM(strlen(text)) AS BIGINT) AS total_bytes,
       CAST(MAX(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT) AS max_tokens
FROM documents GROUP BY source ORDER BY source
"""


def u5_python_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (user-defined TABLE function, Spark 4's newest
    Python-exchange shape, completing the surface next to the pandas
    trio / mapInPandas / applyInPandas / mapInArrow / stateful pair):
    a lateral-joinable table function emitting OVERLAPPING token
    windows (size 32, stride 16) with per-window offsets and an md5
    fingerprint — the sliding-window chunker an embedding pipeline
    runs before encoding, where the overlap makes pure built-in
    expression awkward (x11's non-overlapping chunking stays
    built-in).

    The UDTF is registered and invoked through SQL LATERAL, the
    grammar a user would actually write. Row-at-a-time Python is the
    slow lane — acceptable here because the UDTF is the operator
    under test; the rollup output keeps the oracle compare integer-
    exact (md5 matches DuckDB's md5 on the identical joined string).
    The class captures nothing repo-local (executors run it under the
    external driver's vanilla session)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType=(
        "win_idx int, n_tokens int, start_tok int, "
        "first_tok string, last_tok string, win_md5 string"
    ))
    class TokenWindows:
        def eval(self, text: str):
            import hashlib

            if text is None:
                return
            toks = text.split()
            size, stride = 32, 16
            idx = 0
            for start in range(0, max(len(toks) - size, 0) + stride, stride):
                win = toks[start : start + size]
                if not win or (idx > 0 and start >= len(toks)):
                    break
                yield (
                    idx,
                    len(win),
                    start,
                    win[0],
                    win[-1],
                    hashlib.md5(" ".join(win).encode()).hexdigest(),
                )
                idx += 1
                if start + size >= len(toks):
                    break

    spark.udtf.register("u5_token_windows", TokenWindows)
    load_table(spark, sf_dir, "documents").select(
        "doc_id", F.trim(F.col("text")).alias("text")
    ).createOrReplaceTempView("u5_docs")
    return spark.sql(
        """
        SELECT d.doc_id, w.win_idx, w.n_tokens, w.start_tok,
               w.first_tok, w.last_tok, w.win_md5
        FROM u5_docs d, LATERAL u5_token_windows(d.text) w
        WHERE d.doc_id < 40
        ORDER BY d.doc_id, w.win_idx
        """
    )


U5_ORACLE = """
WITH t AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
  FROM documents WHERE doc_id < 40 AND text IS NOT NULL
),
wins AS (
  SELECT doc_id, toks, CAST(u.i / 16 AS INT) AS win_idx, u.i AS start_tok,
         toks[u.i + 1 : u.i + 32] AS win
  FROM t, LATERAL (
    SELECT unnest(range(0, GREATEST(len(toks) - 32, 0) + 16, 16)) AS i
  ) u
  WHERE u.i < len(toks) OR u.i = 0
)
SELECT doc_id, win_idx, CAST(len(win) AS INT) AS n_tokens,
       CAST(start_tok AS INT) AS start_tok,
       win[1] AS first_tok, win[len(win)] AS last_tok,
       md5(array_to_string(win, ' ')) AS win_md5
FROM wins WHERE len(win) > 0
ORDER BY doc_id, win_idx
"""
