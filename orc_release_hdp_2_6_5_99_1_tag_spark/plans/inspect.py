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


def scan_output_rows(df: DataFrame) -> int:
    """Execute the plan and return the file-scan's `numOutputRows`
    runtime metric (rows surfaced after ORC SARG row-group skipping) —
    the engine's version of the reference's skipped-row accounting.
    Returns -1 if no scan metric is found."""
    df.collect()
    qe = df._jdf.queryExecution()  # type: ignore[attr-defined]
    root = qe.executedPlan()

    found: list[int] = []

    def walk(node) -> None:
        name = node.nodeName()
        if "Scan" in name:
            metrics = node.metrics()
            it = metrics.iterator()
            while it.hasNext():
                kv = it.next()
                if kv._1() == "numOutputRows":
                    found.append(kv._2().value())
        # AQE wrappers hide the live subtree outside children()
        if "AdaptiveSparkPlan" in name:
            walk(node.executedPlan())
        elif "QueryStage" in name:
            walk(node.plan())
        else:
            children = node.children()
            for i in range(children.length()):
                walk(children.apply(i))

    walk(root)
    return min(found) if found else -1


def read_schema_columns(df: DataFrame) -> list[str]:
    """Column names in the first scan's ReadSchema (column pruning)."""
    plan = formatted_plan(df)
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    if not m:
        return []
    return [p.split(":")[0].strip() for p in m.group(1).split(",") if p.strip()]
