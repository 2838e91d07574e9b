"""SQL-API surface: queries expressed as SQL text over registered
views (`spark.sql`), exercising Catalyst's subquery decorrelation —
correlated scalar subqueries and NOT EXISTS — with the IDENTICAL SQL
string serving as the DuckDB oracle (dialect-shared subset).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from orc_release_hdp_2_6_5_99_1_tag_spark.tables import TABLE_NAMES, load_table


def _register(spark: SparkSession, sf_dir: str, names: list[str]) -> None:
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)


Q2_SQL = """
SELECT p_brand, p_partkey, p_name, p_retailprice
FROM part p
WHERE p_retailprice = (
  SELECT MIN(p2.p_retailprice) FROM part p2 WHERE p2.p_brand = p.p_brand
)
ORDER BY p_brand, p_partkey
"""


def q2_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (min per brand) — Catalyst rewrites
    it into an aggregate + join (decorrelation, SURVEY §4 'absent in
    reference, free in Catalyst'). One SQL string, two engines."""
    _register(spark, sf_dir, ["part"])
    return spark.sql(Q2_SQL)


Q22_SQL = """
SELECT c_mktsegment,
       COUNT(*) AS n_customers_without_orders,
       CAST(SUM(c_custkey) AS BIGINT) AS checksum
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


def q22_not_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS anti-join shape (TPC-H Q22 flavor)."""
    _register(spark, sf_dir, ["customer", "orders"])
    return spark.sql(Q22_SQL)
