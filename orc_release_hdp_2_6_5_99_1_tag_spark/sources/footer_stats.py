"""Metadata-only column statistics from ORC footers (SURVEY §4 custom
(c)): answer count/min/max/sum without touching data pages, the way
the reference serves `orc-tools meta` from `Footer.statistics`
(`ColumnStatisticsImpl.java`, proto `Footer.statistics:201`).

Uses the ORC Java library already on Spark's classpath (the very
library the reference ships) through py4j: one footer read per file,
then a driver-side merge — the same partial/final roll-up as
`ColumnStatisticsImpl.merge()`. File counts are small relative to data
(one tail read per ~64 MiB+ file); for million-file lakes, lift the
per-file loop into `orc_meta_distributed`'s mapInPandas pattern.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession


def _orc_files(path: str) -> list[str]:
    if os.path.isfile(path):
        return [path]
    return sorted(
        f
        for f in glob.glob(os.path.join(path, "*.orc"))
        + glob.glob(os.path.join(path, "part-*"))
        if os.path.isfile(f) and not os.path.basename(f).startswith(("_", "."))
    )


def footer_column_stats(spark: SparkSession, path: str) -> DataFrame:
    """Per-column file-footer statistics merged across files:
    (column, n_values, has_null, min, max, sum) — min/max/sum as
    strings (typed stats: integer, double, string, timestamp, date,
    decimal, boolean true-count as sum)."""
    jvm = spark._jvm  # type: ignore[attr-defined]
    conf = spark._jsc.hadoopConfiguration()  # type: ignore[attr-defined]
    merged: dict[str, dict] = {}
    field_names: list[str] = []
    for f in sorted(set(_orc_files(path))):
        jpath = jvm.org.apache.hadoop.fs.Path(f)
        reader = jvm.org.apache.orc.OrcFile.createReader(
            jpath, jvm.org.apache.orc.OrcFile.readerOptions(conf)
        )
        schema = reader.getSchema()
        field_names = list(schema.getFieldNames())
        children = schema.getChildren()
        stats = reader.getStatistics()
        for i, name in enumerate(field_names):
            col_id = children[i].getId()
            s = stats[col_id]
            entry = merged.setdefault(
                name, {"n": 0, "has_null": False, "min": None, "max": None, "sum": None}
            )
            entry["n"] += s.getNumberOfValues()
            entry["has_null"] = entry["has_null"] or s.hasNull()
            cls = s.getClass().getName()
            mn = mx = sm = None
            if "IntegerStatistics" in cls or "Long" in cls and hasattr(s, "getMinimum"):
                mn, mx = s.getMinimum(), s.getMaximum()
                sm = s.getSum() if s.isSumDefined() else None
            elif "DoubleStatistics" in cls:
                mn, mx, sm = s.getMinimum(), s.getMaximum(), s.getSum()
            elif "StringStatistics" in cls:
                mn, mx = s.getMinimum(), s.getMaximum()
            elif "TimestampStatistics" in cls or "DateStatistics" in cls:
                mn, mx = str(s.getMinimum()), str(s.getMaximum())
            elif "BooleanStatistics" in cls:
                sm = s.getTrueCount()
            elif "DecimalStatistics" in cls:
                mn, mx = str(s.getMinimum()), str(s.getMaximum())
                sm = str(s.getSum())
            for k, v in [("min", mn), ("max", mx)]:
                if v is not None:
                    prev = entry[k]
                    if prev is None:
                        entry[k] = v
                    else:
                        entry[k] = (min if k == "min" else max)(prev, v)
            if sm is not None:
                entry["sum"] = sm if entry["sum"] is None else type(sm)(entry["sum"] + sm)
    rows = [
        (
            name,
            int(e["n"]),
            bool(e["has_null"]),
            None if e["min"] is None else str(e["min"]),
            None if e["max"] is None else str(e["max"]),
            None if e["sum"] is None else str(e["sum"]),
        )
        for name, e in merged.items()
    ]
    return spark.createDataFrame(
        rows,
        "column_name string, n_values long, has_null boolean,"
        " min_val string, max_val string, sum_val string",
    ).orderBy("column_name")
