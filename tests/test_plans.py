"""Plan-shape assertions: pushdown, pruning, broadcast — the parts of
the reference's optimizer surface (SURVEY §4) Catalyst must actually
deliver, verified on the physical plan rather than assumed."""

from __future__ import annotations

import pyspark.sql.functions as F

from orc_release_hdp_2_6_5_99_1_tag_spark.plans import (
    formatted_plan,
    pushed_filters,
    read_schema_columns,
)
from orc_release_hdp_2_6_5_99_1_tag_spark.sources.orc_io import orc_copy, read_orc


def test_orc_predicate_pushdown(spark, sf_dir):
    path = orc_copy(spark, sf_dir, "lineitem")
    df = read_orc(spark, path).filter(F.col("l_quantity") >= 30).select("l_orderkey")
    pf = pushed_filters(df)
    assert "l_quantity" in pf, f"predicate not pushed to ORC scan: {pf!r}"


def test_orc_column_pruning(spark, sf_dir):
    path = orc_copy(spark, sf_dir, "lineitem")
    df = read_orc(spark, path).select("l_orderkey", "l_quantity")
    cols = read_schema_columns(df)
    assert set(cols) == {"l_orderkey", "l_quantity"}, f"scan reads extra columns: {cols}"


def test_partition_pruning(spark, sf_dir):
    from orc_release_hdp_2_6_5_99_1_tag_spark.operators.orc_queries import s5_partition_pruning

    df = s5_partition_pruning(spark, sf_dir)
    plan = formatted_plan(df)
    assert "PartitionFilters" in plan
    # the status=F predicate must appear as a partition filter, not a data filter
    assert any(
        "o_orderstatus" in seg for seg in plan.split("PartitionFilters:")[1:]
    ), plan


def test_q3_broadcasts_customer(spark, sf_dir):
    from orc_release_hdp_2_6_5_99_1_tag_spark.operators.relational import q3_shipping_priority

    plan = formatted_plan(q3_shipping_priority(spark, sf_dir))
    assert "BroadcastHashJoin" in plan, "customer dim should broadcast, not shuffle"


def test_q1_whole_stage_codegen(spark, sf_dir):
    from orc_release_hdp_2_6_5_99_1_tag_spark.operators.relational import q1_pricing_summary

    df = q1_pricing_summary(spark, sf_dir)
    df.collect()  # AQE: codegen spans only visible on the final plan
    plan = formatted_plan(df)
    assert "codegen id" in plan, "aggregation should stay in whole-stage codegen (JVM-side)"
    assert "partial_sum" in plan, "expected map-side partial aggregation before the exchange"
    assert "HashAggregate" in plan
