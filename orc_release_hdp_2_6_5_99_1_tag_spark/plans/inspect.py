"""Physical-plan inspection helpers — the engine's `.explain` feedback
loop (SURVEY §4). Used by tests to assert, not hope, that predicates
reach the file scan (reference SARG pushdown), columns are pruned
(reference `include[]`), and partitions are pruned (reference stripe
range selection)."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> str:
    """Concatenated PushedFilters sections of every scan in the plan."""
    plan = formatted_plan(df)
    return " | ".join(re.findall(r"PushedFilters: \[([^\]]*)\]", plan))


def read_schema_columns(df: DataFrame) -> list[str]:
    """Column names in the first scan's ReadSchema (column pruning)."""
    plan = formatted_plan(df)
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    if not m:
        return []
    return [p.split(":")[0].strip() for p in m.group(1).split(",") if p.strip()]
