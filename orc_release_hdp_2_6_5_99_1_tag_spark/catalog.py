"""Central registry mapping query names → (callable, oracle SQL).

This is the single source of truth consumed by `__spark_entry__.py`
(`queries()` / `oracle_sql()`), `bench.py`, and the tests. Each entry
corresponds to a ✦ row of SURVEY.md §2 or a training-data pipeline
operator; `oracle=None` marks genuinely non-SQL-expressible operators
(driver falls back to a rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, fn: QueryFn, oracle: str | None = None) -> None:
    _QUERIES[name] = fn
    if oracle is not None:
        _ORACLES[name] = oracle


def _build() -> None:
    if _QUERIES:
        return
    from orc_release_hdp_2_6_5_99_1_tag_spark.operators import relational as r

    register("q1_pricing_summary", r.q1_pricing_summary, r.Q1_ORACLE)
    register("q3_shipping_priority", r.q3_shipping_priority, r.Q3_ORACLE)
    register("q5_local_supplier_volume", r.q5_local_supplier_volume, r.Q5_ORACLE)
    register("w1_topk_per_group", r.w1_topk_per_group, r.W1_ORACLE)


def queries() -> dict[str, QueryFn]:
    _build()
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    _build()
    return dict(_ORACLES)
