"""Cost-based optimization: ANALYZE-collected statistics must change
the physical plan — the query-layer twin of the reference's thesis
that column statistics drive execution (SURVEY §1.3 / §4: the footer
stats exist so readers can plan; here catalog stats let Catalyst pick
a broadcast join it could not justify from raw file sizes).

The classic CBO demonstration: a selective filter on a big table's
join side. Without column histograms Spark estimates the filtered
side at ~full-table size (no broadcast); with CBO enabled and
ANALYZE ... FOR COLUMNS stats, the selectivity estimate collapses
below the broadcast threshold and the join flips to BroadcastHashJoin.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from orc_release_hdp_2_6_5_99_1_tag_spark.plans import formatted_plan
from orc_release_hdp_2_6_5_99_1_tag_spark.tables import load_table

_CONFS = {
    "spark.sql.cbo.enabled": "true",
    "spark.sql.cbo.joinReorder.enabled": "true",
    # static planning only: AQE would fix the join at runtime anyway,
    # which is exactly what this test must NOT rely on
    "spark.sql.adaptive.enabled": "false",
    # force the file-size estimate of orders above the threshold so
    # only the stats-based filtered estimate can justify a broadcast
    "spark.sql.autoBroadcastJoinThreshold": str(8 * 1024),
}


def _with_confs(spark, confs):
    saved = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    return saved


def _restore(spark, saved):
    for k, v in saved.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_analyze_column_stats_flip_join_to_broadcast(spark, sf_dir):
    spark.sql("DROP TABLE IF EXISTS cbo_orders")
    spark.sql("DROP TABLE IF EXISTS cbo_lineitem")
    load_table(spark, sf_dir, "orders").write.mode("overwrite").saveAsTable("cbo_orders")
    load_table(spark, sf_dir, "lineitem").write.mode("overwrite").saveAsTable("cbo_lineitem")
    saved = _with_confs(spark, _CONFS)
    try:
        # ~1/5 of orders pass, but a highly selective totalprice cut
        # brings the estimated (and actual) row count near zero
        q = """
            SELECT l.l_quantity, o.o_totalprice
            FROM cbo_orders o JOIN cbo_lineitem l ON o.o_orderkey = l.l_orderkey
            WHERE o.o_totalprice < 1000
        """
        before = formatted_plan(spark.sql(q))
        assert "SortMergeJoin" in before, f"pre-stats plan should shuffle:\n{before}"

        spark.sql("ANALYZE TABLE cbo_orders COMPUTE STATISTICS FOR COLUMNS o_totalprice, o_orderkey")
        spark.sql("ANALYZE TABLE cbo_lineitem COMPUTE STATISTICS")
        after = formatted_plan(spark.sql(q))
        assert "BroadcastHashJoin" in after, (
            f"column stats did not flip the join to broadcast:\n{after}"
        )
        # and the result itself is stats-independent
        n = spark.sql(q).count()
        o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") < 1000)
        exact = o.join(
            load_table(spark, sf_dir, "lineitem"),
            o["o_orderkey"] == F.col("l_orderkey"),
        ).count()
        assert n == exact
    finally:
        _restore(spark, saved)
        spark.sql("DROP TABLE IF EXISTS cbo_orders")
        spark.sql("DROP TABLE IF EXISTS cbo_lineitem")
