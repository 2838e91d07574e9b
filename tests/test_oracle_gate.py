"""Tests for the correctness gate itself (round-1 lesson: the gate must
reproduce the driver's pandas normalization, where DuckDB HUGEINT
renders as float64) and for byte-true multimodal oracles on non-ASCII
corpora."""

from __future__ import annotations

import os

import pytest

from tests.oracle_utils import compare_query, duckdb_con


def test_gate_catches_uncast_hugeint_sum(spark, sf_dir):
    """An uncast integer SUM (DuckDB HUGEINT -> pandas float64) must
    fail the local gate even though the *values* are identical — this
    is exactly the divergence that cost 18 rows in round 1."""
    import pyspark.sql.functions as F

    from orc_release_hdp_2_6_5_99_1_tag_spark.tables import load_table

    df = load_table(spark, sf_dir, "nation").agg(F.sum("n_nationkey").alias("s"))
    con = duckdb_con(sf_dir)
    try:
        with pytest.raises(AssertionError, match="pandas-path"):
            compare_query(df, con, "SELECT SUM(n_nationkey) AS s FROM nation")
        # and the cast form passes
        compare_query(df, con, "SELECT CAST(SUM(n_nationkey) AS BIGINT) AS s FROM nation")
    finally:
        con.close()


def test_m1_oracle_byte_true_on_non_ascii(spark, tmp_path):
    """m1's oracle must checksum UTF-8 *bytes* (what the Python side
    sums over the binary payload), not codepoints — exercised here on
    a corpus with 2-, 3-, and 4-byte UTF-8 sequences."""
    from orc_release_hdp_2_6_5_99_1_tag_spark.operators.multimodal import (
        M1_ORACLE,
        m1_multimodal_features,
    )

    rows = [
        (1, "héllo wörld", "web-1", "de", 11),
        (2, "日本語テキスト majority ascii tail", "web-1", "ja", 28),
        (3, "emoji 🎉🚀 mix", "web-2", "en", 12),
        (4, "plain ascii document", "web-2", "en", 20),
        (5, "", "web-3", "en", 0),
        (6, "mixed ασδφ русский 中文 🌍", "web-3", "el", 24),
    ]
    import pyarrow as pa
    import pyarrow.parquet as pq

    sf = str(tmp_path / "sfx")
    os.makedirs(sf, exist_ok=True)
    # single-file parquet, matching the driver's testdata layout
    table = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "source": pa.array([r[2] for r in rows], pa.string()),
            "lang": pa.array([r[3] for r in rows], pa.string()),
            "n_chars": pa.array([r[4] for r in rows], pa.int32()),
        }
    )
    pq.write_table(table, os.path.join(sf, "documents.parquet"))

    con = duckdb_con(sf)
    try:
        compare_query(m1_multimodal_features(spark, sf), con, M1_ORACLE)
    finally:
        con.close()


def test_u3_oracle_on_hostile_text(spark, tmp_path):
    """u3's tokenizer must agree with the oracle's RE2 split on
    non-ASCII whitespace (NBSP stays inside a token on both sides) and
    on NULL/empty/whitespace-only text (doc scores exactly `bias`)."""
    from orc_release_hdp_2_6_5_99_1_tag_spark.operators.extras import (
        U3_ORACLE,
        u3_model_inference,
    )

    rows = [
        (1, "a b nbsp-joined", "web-1"),          # NBSP inside a token
        (2, None, "web-1"),                             # NULL text
        (3, "", "web-2"),                               # empty text
        (4, " \t\n ", "web-2"),                         # ASCII whitespace only
        (5, "plain ascii words here", "web-3"),
        (6, "tabs\tand\nnewlines\rsplit", "web-3"),
        (7, " em-space token", "web-3"),      # Unicode space, not ASCII
    ]
    import pyarrow as pa
    import pyarrow.parquet as pq

    sf = str(tmp_path / "sfu")
    os.makedirs(sf, exist_ok=True)
    table = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "source": pa.array([r[2] for r in rows], pa.string()),
        }
    )
    pq.write_table(table, os.path.join(sf, "documents.parquet"))

    con = duckdb_con(sf)
    try:
        compare_query(u3_model_inference(spark, sf), con, U3_ORACLE)
    finally:
        con.close()


def test_x23_oracle_sensitive_to_bm25_constants(spark, sf_dir):
    """The BM25 oracle must not be vacuous: perturbing k1 on the oracle
    side only (1.2 -> 1.5) must fail the compare — the score_ppm values
    are load-bearing, not just the row shape."""
    from orc_release_hdp_2_6_5_99_1_tag_spark.operators.text import (
        X23_ORACLE,
        x23_bm25_topk,
    )

    df = x23_bm25_topk(spark, sf_dir)
    con = duckdb_con(sf_dir)
    try:
        compare_query(df, con, X23_ORACLE)  # baseline: green
        perturbed = X23_ORACLE.replace("1.2", "1.5")
        assert perturbed != X23_ORACLE
        with pytest.raises(AssertionError):
            compare_query(df, con, perturbed)
    finally:
        con.close()


def test_v8_oracle_sensitive_to_kind_split(spark, sf_dir):
    """v8's positive/negative split is load-bearing: flipping the
    label comparison in the oracle must fail the compare."""
    from orc_release_hdp_2_6_5_99_1_tag_spark.operators.similarity import (
        V8_ORACLE,
        v8_hard_negative_mining,
    )

    df = v8_hard_negative_mining(spark, sf_dir)
    con = duckdb_con(sf_dir)
    try:
        compare_query(df, con, V8_ORACLE)
        perturbed = V8_ORACLE.replace(
            "WHEN e.label = q.anchor_label THEN 'pos'",
            "WHEN e.label <> q.anchor_label THEN 'pos'",
        )
        assert perturbed != V8_ORACLE
        with pytest.raises(AssertionError):
            compare_query(df, con, perturbed)
    finally:
        con.close()


def test_r12_oracle_sensitive_to_row_budget(spark, sf_dir):
    """r12's exactly-once guarantee is graded through the row count:
    an oracle expecting one extra batch (as a dropped-or-replayed
    offset would produce) must fail."""
    from orc_release_hdp_2_6_5_99_1_tag_spark.sources.pyds import SYNTH_N
    from orc_release_hdp_2_6_5_99_1_tag_spark.streaming.ingest import (
        R12_ORACLE,
        r12_python_stream_source,
    )

    df = r12_python_stream_source(spark, sf_dir)
    con = duckdb_con(sf_dir)
    try:
        compare_query(df, con, R12_ORACLE)
        perturbed = R12_ORACLE.replace(str(SYNTH_N - 1), str(SYNTH_N + 2999))
        assert perturbed != R12_ORACLE
        with pytest.raises(AssertionError):
            compare_query(df, con, perturbed)
    finally:
        con.close()


def test_a1_scaled_sum_exact_at_huge_magnitudes(spark):
    """a1's scaled-long arithmetic vs the r13-verdict "literal edge"
    claim, adjudicated r14 with measurements (OPTIMIZATION_r14.md):

    (a) PER-VALUE floor(c*10000 + 0.5) on a BIGINT COLUMN is exact
        decimal arithmetic in BOTH engines (Spark types `0.5` as
        DECIMAL(1,1) ⇒ exact long multiply + decimal add; DuckDB's
        column path is DECIMAL(21,1)) — they match bit-for-bit through
        the whole non-overflow range, and both raise LOUDLY past
        |c|*10000 > 2^63. The verdict-proposed
        `CAST(c*10000 AS DOUBLE) + 0.5` (= the pre-r13 Column build
        with F.lit(0.5)) would round the product to double and
        SILENTLY DIVERGE from DuckDB from |c| ≈ 2^45 — measured:
        35184372088835*10000 reads ...350016 on the double path vs
        the exact ...350000 both engines actually produce. So the
        committed r13 form stays.

    (b) The residual cross-engine hazard is elsewhere: the ORACLE's
        final `CAST(SUM(..) AS DECIMAL(38,4))/10000` renders through
        DOUBLE in DuckDB (decimal/int division is double there) while
        Spark divides in decimal. Guaranteed bit-exact while the
        DECIMAL(38,4)'s INTERNAL scaled integer (= scaled sum x 10^4
        = column sum x 10^8) stays under 2^53; past that the
        decimal->double conversion can round across a 1e-4 quantum
        (measured: column sum 8e11+3 renders ...3.0001 in DuckDB vs
        the exact ...3.0000 in Spark), value-dependently — the tested
        SFs peak at column sums ~2.3e10 where the double error
        (~5e-6) stays inside the rendered quantum and the oracle
        matches. Pinned here so a future huge-sum fixture fails THIS
        test instead of silently drifting the oracle."""
    import duckdb

    from orc_release_hdp_2_6_5_99_1_tag_spark.operators.stats import (
        _scaled_sum_sql,
    )

    con = duckdb.connect()
    # (a) per-value parity through the hazard range (incl. > 2^45)
    for v in [2**40 + 1, 2**45 + 3, 9 * 10**14 + 7]:
        df = spark.createDataFrame([(v,)], "c bigint")
        (got,) = df.selectExpr(
            "CAST(floor(`c` * 10000 + 0.5) AS BIGINT) AS s"
        ).collect()[0]
        assert got == v * 10000, (v, got)  # exact long product
        (duck,) = con.execute(
            f"SELECT CAST(FLOOR(c*10000 + 0.5) AS BIGINT)"
            f" FROM (SELECT CAST({v} AS BIGINT) AS c)"
        ).fetchone()
        assert got == duck, (v, got, duck)
    def duck_pipeline(v: int) -> str:
        (duck,) = con.execute(
            "SELECT CAST(CAST(CAST(SUM(CAST(FLOOR(c*10000 + 0.5) AS BIGINT)) AS DECIMAL(38,4))/10000"
            f" AS DECIMAL(38,4)) AS VARCHAR) FROM (SELECT CAST({v} AS BIGINT) AS c)"
        ).fetchone()
        return duck

    # (b) full-pipeline parity guaranteed while sum x 10^8 < 2^53
    v = 8 * 10**7 + 3  # internal scaled int 8.0e15 < 2^53 ≈ 9.007e15
    df = spark.createDataFrame([(v,)], "c bigint")
    (got,) = df.selectExpr(_scaled_sum_sql("`c`") + " AS s").collect()[0]
    assert got == duck_pipeline(v) == f"{v}.0000", (got, duck_pipeline(v))
    # ...and the divergence example past the bound, pinned so the
    # hazard stays documented-by-execution: Spark's decimal division
    # stays exact, DuckDB's double rendering rounds up a quantum
    v = 8 * 10**11 + 3  # internal scaled int 8.0e19 >> 2^53
    df = spark.createDataFrame([(v,)], "c bigint")
    (got,) = df.selectExpr(_scaled_sum_sql("`c`") + " AS s").collect()[0]
    assert got == f"{v}.0000", got
    assert duck_pipeline(v) == f"{v}.0001", duck_pipeline(v)
