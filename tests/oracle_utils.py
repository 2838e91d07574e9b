"""Local replica of the driver's Spark-vs-DuckDB correctness compare:
row count, column set, and order-insensitive value equality.

Round-1 lesson: the driver normalizes through *pandas*, where DuckDB
HUGEINT (uncast integer SUM) becomes float64 and renders "123.0" vs
Spark's int64 "123" — 18 queries failed on the driver while the old
fetchall-based gate here was green. The compare is now two-layered:

1. pandas-path compare (`rel.df()` vs `df.toPandas()`, per-cell str)
   — mirrors the driver's normalization, so type divergence like
   HUGEINT-vs-BIGINT fails locally first;
2. fetchall-path compare (Python-native values) — catches value bugs
   the pandas path could mask.
"""

from __future__ import annotations

import math
import os

import duckdb
import numpy as np
import pandas as pd

from orc_release_hdp_2_6_5_99_1_tag_spark.tables import TABLE_NAMES


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(p):
            # multi-file fixture layout (scripts/make_mrg_fixture.py):
            # <table>.parquet/ is a DIRECTORY of part files
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # full precision — determinism is the query author's job
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def _norm_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm_cell(r[i]) for i in idx) for r in rows)


def _norm_pandas_cell(v):
    """Driver-style stringification of a pandas cell."""
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "NULL"
    if v is pd.NaT:
        return "NULL"
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, np.generic):
        v = v.item()
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        return repr(v)
    return str(v)


def _norm_pandas(pdf: pd.DataFrame):
    pdf = pdf[sorted(pdf.columns)]
    return sorted(
        tuple(_norm_pandas_cell(v) for v in row) for row in pdf.itertuples(index=False)
    )


def compare_query(spark_df, con, sql: str) -> None:
    s_cols = list(spark_df.columns)
    rel = con.sql(sql)
    d_cols = list(rel.columns)
    assert sorted(s_cols) == sorted(d_cols), f"columns differ: {s_cols} vs {d_cols}"

    # Layer 1: pandas-path (the driver's normalization).
    s_pdf = spark_df.toPandas()
    d_pdf = rel.df()
    assert len(s_pdf) == len(d_pdf), f"row count differs: {len(s_pdf)} vs {len(d_pdf)}"
    sp, dp = _norm_pandas(s_pdf), _norm_pandas(d_pdf)
    pandas_mismatch = [(a, b) for a, b in zip(sp, dp) if a != b]
    assert not pandas_mismatch, (
        f"pandas-path mismatch ({len(pandas_mismatch)} rows) — this is what the "
        f"driver hashes; first: {pandas_mismatch[0]}"
    )

    # Layer 2: fetchall-path (Python-native values).
    s_rows = [tuple(r) for r in spark_df.collect()]
    d_rows = con.sql(sql).fetchall()
    sn, dn = _norm_rows(s_cols, s_rows), _norm_rows(d_cols, d_rows)
    mismatches = [(a, b) for a, b in zip(sn, dn) if a != b]
    assert not mismatches, f"value mismatch ({len(mismatches)} rows), first: {mismatches[0]}"
