"""CLI-tool equivalents (SURVEY S11/S12: `orc-tools data/scan`,
C++ `orc-contents`): row dumps as JSON lines and a scan benchmark —
DataFrame-level, driver-loop-free.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def orc_data(spark: SparkSession, path: str, limit: int | None = None) -> DataFrame:
    """`orc-tools data`: each row rendered as a JSON document
    (executor-side to_json, not a driver loop)."""
    df = spark.read.orc(path)
    if limit is not None:
        df = df.limit(limit)
    return df.select(F.to_json(F.struct(*df.columns)).alias("json"))


def orc_scan(spark: SparkSession, path: str) -> DataFrame:
    """`orc-tools scan`: read all batches, count rows — no
    materialization beyond the count (the reference's benchmark tool,
    `ScanData.java:63-80`)."""
    return spark.read.orc(path).agg(F.count(F.lit(1)).alias("rows"))
