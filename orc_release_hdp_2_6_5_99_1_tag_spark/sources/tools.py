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


def orc_scan_explain(path: str, tree) -> dict:
    """`orc-tools scan --explain`-style pruning report from metadata
    alone (no JVM, no data pages): per-stripe TruthValue/keep from the
    Metadata section, per-row-group decisions (ROW_INDEX min/max +
    bloom probes) from the index regions — the decisions the
    reference's pickRowGroups would make for this predicate tree.
    Tree grammar is `functions.truth.evaluate_tree`'s."""
    from orc_release_hdp_2_6_5_99_1_tag_spark.functions.truth import (
        explain_file_pruning,
        pick_row_groups,
    )

    stripes = explain_file_pruning(path, tree)
    row_groups = pick_row_groups(path, tree)
    return {
        "stripes": stripes,
        "row_groups": row_groups,
        "n_stripes_kept": sum(1 for s in stripes if s["keep"]),
        "n_row_groups_kept": sum(
            1 for per_stripe in row_groups for d in per_stripe if d["keep"]
        ),
        "n_row_groups": sum(len(per_stripe) for per_stripe in row_groups),
    }
