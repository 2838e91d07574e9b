"""Similarity search over embedding columns (SURVEY §2.13):
brute-force cosine top-k as the exactness baseline, plus two scale
paths — sign-LSH bucketing (v2) and IVF inverted lists with a coarse
quantizer (v3).

Scale notes: brute force is O(queries × corpus) — fine when the query
side is small enough to broadcast (it is, here and in the typical
"dedupe this batch against the corpus" shape); the dot products stay
JVM-side via zip_with/aggregate (no Python). The LSH variant buckets
the corpus once (narrow map), turning each probe into a bucket-local
scan — the 100 TB pattern where a full cross join is impossible.
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf type hints resolve here
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from orc_release_hdp_2_6_5_99_1_tag_spark.tables import load_table

_N_QUERIES = 5
_TOP_K = 3
_LSH_BITS = 8


def _dot(a, b):
    """Dot product of two float-array columns in double, list-order
    summation (bit-identical in the oracle)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    """L2 norm of a float-array column (same summation order as the
    per-pair variant, so factoring it out is bit-identical)."""
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))


def _cosine(a, b, na=None, nb=None):
    """Cosine similarity of two float-array columns. Pass precomputed
    per-row norm columns (na/nb) to avoid recomputing the corpus norm
    once per query pair — at N queries x M corpus rows that turns
    3 interpreted aggregates per pair into 1."""
    na = _norm(a) if na is None else na
    nb = _norm(b) if nb is None else nb
    return _dot(a, b) / (na * nb)


def v1_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k: the first 5 vectors are the queries;
    top-3 corpus neighbors each (including self, similarity 1)."""
    e = load_table(spark, sf_dir, "embeddings")
    corpus = e.select("vec_id", "embedding", _norm(F.col("embedding")).alias("c_norm"))
    q = corpus.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("c_norm").alias("q_norm"),
    )
    pairs = F.broadcast(q).crossJoin(corpus)
    sim = pairs.select(
        "query_id",
        "vec_id",
        _cosine(
            F.col("q_emb"), F.col("embedding"), F.col("q_norm"), F.col("c_norm")
        ).alias("cosine_raw"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_raw"), F.asc("vec_id"))
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _TOP_K)
        .select(
            "query_id",
            "vec_id",
            F.format_string("%.4f", F.col("cosine_raw")).alias("cosine"),
            "rank",
        )
        .orderBy("query_id", "rank")
    )


V1_ORACLE = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings WHERE vec_id < {_N_QUERIES}
), sim AS (
  SELECT q.query_id, e.vec_id,
         list_cosine_similarity(CAST(q.q_emb AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])) AS cosine_raw
  FROM q CROSS JOIN embeddings e
), ranked AS (
  SELECT query_id, vec_id, cosine_raw,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine_raw DESC, vec_id ASC) AS rank
  FROM sim
)
SELECT query_id, vec_id, printf('%.4f', cosine_raw) AS cosine, rank FROM ranked
WHERE rank <= {_TOP_K} ORDER BY query_id, rank
"""


def _sign_bucket(col):
    """Axis-aligned sign-LSH bucket: bit i = sign(embedding[i]),
    i in [0, _LSH_BITS)."""
    bucket = None
    for i in range(_LSH_BITS):
        bit = F.when(F.element_at(col, i + 1) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return bucket


def v2_lsh_bucketed_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed approximate NN: corpus bucketed by 8 sign bits; each
    query scans only its own bucket (~1/256 of the corpus) for the
    nearest non-self neighbor. Returns (query, neighbor, cosine,
    bucket) — approximate by construction; the oracle replicates the
    same approximation."""
    e = load_table(spark, sf_dir, "embeddings")
    bucketed = e.select(
        "vec_id",
        "embedding",
        _sign_bucket(F.col("embedding")).alias("bucket"),
        _norm(F.col("embedding")).alias("c_norm"),
    )
    q = bucketed.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("bucket").alias("q_bucket"),
        F.col("c_norm").alias("q_norm"),
    )
    pairs = F.broadcast(q).join(
        bucketed,
        (F.col("bucket") == F.col("q_bucket")) & (F.col("vec_id") != F.col("query_id")),
    )
    sim = pairs.select(
        "query_id",
        "vec_id",
        "bucket",
        _cosine(
            F.col("q_emb"), F.col("embedding"), F.col("q_norm"), F.col("c_norm")
        ).alias("cosine_raw"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_raw"), F.asc("vec_id"))
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") == 1)
        .select(
            "query_id",
            "vec_id",
            F.format_string("%.4f", F.col("cosine_raw")).alias("cosine"),
            "bucket",
        )
        .orderBy("query_id")
    )


_IVF_K = 16       # coarse centroids
_IVF_NPROBE = 4   # clusters probed per query


def v3_ivf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style approximate NN: the inverted-file counterpart to v2's
    sign-LSH. Coarse quantizer = 16 deterministic centroid vectors
    (corpus rows 100..115 — a stand-in for k-means output, which would
    be data-dependent and oracle-incomparable). Every corpus vector is
    assigned to its nearest centroid (one narrow broadcast-cosine map
    + an argmin); each query probes its `nprobe`=4 nearest centroids
    and scans only those inverted lists (~nprobe/K of the corpus).

    Scale shape: assignment is corpus × K broadcast cosines — a narrow
    map whose argmin here uses a row_number window on vec_id (swap to
    a single-pass max_by at 100 TB, same result); the probe join hits
    only the probed clusters, never the full corpus.
    """
    e = load_table(spark, sf_dir, "embeddings")
    corpus = e.select("vec_id", "embedding", _norm(F.col("embedding")).alias("e_norm"))
    cents = corpus.filter((F.col("vec_id") >= 100) & (F.col("vec_id") < 100 + _IVF_K)).select(
        (F.col("vec_id") - 100).alias("centroid_id"),
        F.col("embedding").alias("c_emb"),
        F.col("e_norm").alias("cent_norm"),
    )
    # inverted lists: nearest centroid per corpus vector (corpus norm
    # computed once per row, not once per centroid pair)
    assign_sim = corpus.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        "embedding",
        "e_norm",
        "centroid_id",
        _cosine(
            F.col("embedding"), F.col("c_emb"), F.col("e_norm"), F.col("cent_norm")
        ).alias("ac"),
    )
    wa = Window.partitionBy("vec_id").orderBy(F.desc("ac"), F.asc("centroid_id"))
    lists = (
        assign_sim.withColumn("arn", F.row_number().over(wa))
        .filter(F.col("arn") == 1)
        .select("vec_id", "embedding", "e_norm", "centroid_id")
    )
    # probe: nprobe nearest centroids per query
    q = corpus.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("e_norm").alias("q_norm"),
    )
    probe_sim = q.crossJoin(F.broadcast(cents)).select(
        "query_id",
        "q_emb",
        "q_norm",
        "centroid_id",
        _cosine(F.col("q_emb"), F.col("c_emb"), F.col("q_norm"), F.col("cent_norm")).alias("pc"),
    )
    wp = Window.partitionBy("query_id").orderBy(F.desc("pc"), F.asc("centroid_id"))
    probes = (
        probe_sim.withColumn("prn", F.row_number().over(wp))
        .filter(F.col("prn") <= _IVF_NPROBE)
        .select("query_id", "q_emb", "q_norm", "centroid_id")
    )
    # search only the probed inverted lists
    pairs = F.broadcast(probes).join(lists, "centroid_id").filter(
        F.col("vec_id") != F.col("query_id")
    )
    sim = pairs.select(
        "query_id",
        "vec_id",
        "centroid_id",
        _cosine(F.col("q_emb"), F.col("embedding"), F.col("q_norm"), F.col("e_norm")).alias("c"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("c"), F.asc("vec_id"))
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _TOP_K)
        .select(
            "query_id",
            "vec_id",
            F.format_string("%.4f", F.col("c")).alias("cosine"),
            "centroid_id",
            "rank",
        )
        .orderBy("query_id", "rank")
    )


V3_ORACLE = f"""
WITH cents AS (
  SELECT vec_id - 100 AS centroid_id, embedding AS c_emb
  FROM embeddings WHERE vec_id >= 100 AND vec_id < {100 + _IVF_K}
), assign_sim AS (
  SELECT e.vec_id, e.embedding, c.centroid_id,
         list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(c.c_emb AS DOUBLE[])) AS ac
  FROM embeddings e CROSS JOIN cents c
), lists AS (
  SELECT vec_id, embedding, centroid_id FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ac DESC, centroid_id ASC) AS arn
    FROM assign_sim
  ) WHERE arn = 1
), q AS (
  SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings WHERE vec_id < {_N_QUERIES}
), probes AS (
  SELECT query_id, q_emb, centroid_id FROM (
    SELECT q.query_id, q.q_emb, c.centroid_id,
           ROW_NUMBER() OVER (
             PARTITION BY q.query_id
             ORDER BY list_cosine_similarity(CAST(q.q_emb AS DOUBLE[]), CAST(c.c_emb AS DOUBLE[])) DESC,
                      c.centroid_id ASC
           ) AS prn
    FROM q CROSS JOIN cents c
  ) WHERE prn <= {_IVF_NPROBE}
), sim AS (
  SELECT p.query_id, l.vec_id, l.centroid_id,
         list_cosine_similarity(CAST(p.q_emb AS DOUBLE[]), CAST(l.embedding AS DOUBLE[])) AS c
  FROM probes p JOIN lists l ON l.centroid_id = p.centroid_id AND l.vec_id != p.query_id
)
SELECT query_id, vec_id, printf('%.4f', c) AS cosine, centroid_id, rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY c DESC, vec_id ASC) AS rank
  FROM sim
) WHERE rank <= {_TOP_K} ORDER BY query_id, rank
"""


def d6_embedding_cosine_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup: an incoming batch (vec_id < 200)
    checked against the whole corpus for cosine ≥ 0.4 — the
    dedupe-new-data-against-corpus shape. Batch side broadcasts; the
    corpus is scanned once. (This synthetic corpus has no planted
    vector dups — threshold 0.4 surfaces the near-collision tail; the
    operator is the contract, the oracle replicates it.)"""
    e = load_table(spark, sf_dir, "embeddings")
    corpus = e.select("vec_id", "embedding", _norm(F.col("embedding")).alias("c_norm"))
    batch = corpus.filter(F.col("vec_id") < 200).select(
        F.col("vec_id").alias("new_id"),
        F.col("embedding").alias("new_emb"),
        F.col("c_norm").alias("b_norm"),
    )
    pairs = F.broadcast(batch).crossJoin(corpus).filter(F.col("vec_id") != F.col("new_id"))
    sim = pairs.select(
        "new_id",
        "vec_id",
        _cosine(F.col("new_emb"), F.col("embedding"), F.col("b_norm"), F.col("c_norm")).alias("c"),
    )
    return (
        sim.filter(F.col("c") >= 0.4)
        .select("new_id", "vec_id", F.format_string("%.4f", F.col("c")).alias("cosine"))
        .orderBy("new_id", "vec_id")
    )


D6_ORACLE = """
WITH batch AS (
  SELECT vec_id AS new_id, embedding AS new_emb FROM embeddings WHERE vec_id < 200
), sim AS (
  SELECT b.new_id, e.vec_id,
         list_cosine_similarity(CAST(b.new_emb AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])) AS c
  FROM batch b CROSS JOIN embeddings e
  WHERE e.vec_id != b.new_id
)
SELECT new_id, vec_id, printf('%.4f', c) AS cosine
FROM sim WHERE c >= 0.4 ORDER BY new_id, vec_id
"""


def _sql_bucket(col: str) -> str:
    return " + ".join(
        f"(CASE WHEN {col}[{i + 1}] >= 0 THEN {1 << i} ELSE 0 END)" for i in range(_LSH_BITS)
    )


V2_ORACLE = f"""
WITH b AS (
  SELECT vec_id, embedding, {_sql_bucket('embedding')} AS bucket FROM embeddings
), q AS (
  SELECT vec_id AS query_id, embedding AS q_emb, bucket AS q_bucket
  FROM b WHERE vec_id < {_N_QUERIES}
), sim AS (
  SELECT q.query_id, b.vec_id, b.bucket,
         list_cosine_similarity(CAST(q.q_emb AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) AS cosine_raw
  FROM q JOIN b ON b.bucket = q.q_bucket AND b.vec_id != q.query_id
), ranked AS (
  SELECT query_id, vec_id, cosine_raw, bucket,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine_raw DESC, vec_id ASC) AS rank
  FROM sim
)
SELECT query_id, vec_id, printf('%.4f', cosine_raw) AS cosine, bucket FROM ranked WHERE rank = 1 ORDER BY query_id
"""


def cosine_topk_vectorized(
    spark: SparkSession, sf_dir: str, n_queries: int = _N_QUERIES, top_k: int = _TOP_K
) -> DataFrame:
    """The Arrow fast path for v1: per-batch numpy matrix product
    inside a pandas_udf (one BLAS gemm per Arrow batch vs an
    interpreted per-element lambda — the 10-100× vectorization the
    scale path needs). The query matrix is collected once (it is the
    broadcast-small side by construction) and shipped inside the UDF
    closure. Exactness is anchored by the parity test against v1's
    zip_with/aggregate baseline; numpy's pairwise summation can differ
    from sequential summation in the last ulp, which is why this
    variant is pytest-anchored rather than oracle-hashed."""
    import numpy as np

    e = load_table(spark, sf_dir, "embeddings")
    q_rows = sorted(
        e.filter(F.col("vec_id") < n_queries).select("vec_id", "embedding").collect(),
        key=lambda r: r.vec_id,
    )
    qm = np.array([r.embedding for r in q_rows], dtype=np.float64)
    qn = np.linalg.norm(qm, axis=1)

    @F.pandas_udf("array<double>")
    def cos_all(emb: pd.Series) -> pd.Series:
        m = np.array(emb.tolist(), dtype=np.float64)
        dots = m @ qm.T
        norms = np.linalg.norm(m, axis=1)[:, None] * qn[None, :]
        return pd.Series((dots / norms).tolist())

    expl = e.select("vec_id", cos_all("embedding").alias("cos")).select(
        "vec_id", F.posexplode("cos").alias("query_id", "cosine_raw")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_raw"), F.asc("vec_id"))
    return (
        expl.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select("query_id", "vec_id", "cosine_raw", "rank")
        .orderBy("query_id", "rank")
    )
