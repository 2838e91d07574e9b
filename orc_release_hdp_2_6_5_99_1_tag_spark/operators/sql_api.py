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


Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS n_orders
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS semi-join + aggregate (TPC-H Q4 shape, adapted to the
    reduced schema: 'shipped after order date' replaces
    commitdate<receiptdate)."""
    _register(spark, sf_dir, ["orders", "lineitem"])
    return spark.sql(Q4_SQL)


Q10_SQL = """
SELECT c.c_custkey, c.c_name,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l.l_discount AS DECIMAL(8,4))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-way join + top-20 by exact-decimal revenue (TPC-H Q10
    shape): dims broadcast, revenue summed in DECIMAL for cross-engine
    determinism, one final cast to DOUBLE."""
    _register(spark, sf_dir, ["customer", "orders", "lineitem"])
    return spark.sql(Q10_SQL)


Q14_SQL = """
SELECT 100.0 * CAST(SUM(CASE WHEN p.p_type LIKE 'PROMO%' THEN CAST(l.l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l.l_discount AS DECIMAL(8,4)) ELSE CAST(0.00 AS DECIMAL(18,2)) END) AS DOUBLE)
       / CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l.l_discount AS DECIMAL(8,4))) AS DOUBLE) AS promo_revenue_pct,
       COUNT(*) AS n_items
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
"""


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional-aggregate ratio (TPC-H Q14): numerator and
    denominator are exact DECIMAL sums; the division runs in DOUBLE on
    both engines (decimal-division scale rules differ between Spark
    and DuckDB — doing the quotient in decimal diverges)."""
    _register(spark, sf_dir, ["lineitem", "part"])
    return spark.sql(Q14_SQL)


Q16_SQL = """
SELECT p.p_brand, p.p_type, COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_size >= 25
  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p.p_brand, p.p_type
ORDER BY supplier_cnt DESC, p_brand, p_type
LIMIT 20
"""


def q16_parts_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN null-aware anti-join + distinct aggregate (TPC-H Q16
    shape; the exclusion predicate adapts to the reduced schema)."""
    _register(spark, sf_dir, ["lineitem", "part", "supplier"])
    return spark.sql(Q16_SQL)


Q18_SQL = """
SELECT o.o_orderkey, o.o_custkey,
       CAST(SUM(CAST(l.l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderkey IN (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 150
)
GROUP BY o.o_orderkey, o.o_custkey
ORDER BY total_qty DESC, o_orderkey
LIMIT 20
"""


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN + grouped HAVING subquery (TPC-H Q18 shape): the subquery's
    aggregate semi-joins back against the same fact table."""
    _register(spark, sf_dir, ["orders", "lineitem"])
    return spark.sql(Q18_SQL)


Q7_SQL = """
SELECT supp_nation, cust_nation, l_year,
       CAST(SUM(CAST(volume AS DECIMAL(18,4))) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation,
         n2.n_name AS cust_nation,
         CAST(EXTRACT(YEAR FROM l.l_shipdate) AS INT) AS l_year,
         l.l_extendedprice * (1 - l.l_discount) AS volume
  FROM supplier s
  JOIN lineitem l ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
  JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
  WHERE n1.n_name IN ('NATION_0', 'NATION_1')
    AND n2.n_name IN ('NATION_0', 'NATION_1')
    AND n1.n_name <> n2.n_name
) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (volume shipping between two nations by year):
    5-way join where nation is broadcast twice under two aliases;
    revenue summed over exact decimals for cross-engine stability."""
    _register(spark, sf_dir, ["supplier", "lineitem", "orders", "customer", "nation"])
    return spark.sql(Q7_SQL)


Q15_SQL = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS total_revenue
  FROM lineitem
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, CAST(r.total_revenue AS DOUBLE) AS total_revenue
FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s.s_suppkey
"""


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape (top supplier by revenue): CTE reused twice —
    once aggregated to a scalar — exercising Catalyst's subquery
    handling; decimal accumulation keeps the MAX comparison exact."""
    _register(spark, sf_dir, ["supplier", "lineitem"])
    return spark.sql(Q15_SQL)


Q17_SQL = """
SELECT CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS DOUBLE) AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#1'
  AND l.l_quantity < (
    SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey
  )
"""


def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (small-quantity-order revenue): correlated
    scalar AVG subquery against the fact table itself — Catalyst
    decorrelates it into an aggregate+join; the 0.2*AVG threshold is
    evaluated per part."""
    _register(spark, sf_dir, ["lineitem", "part"])
    return spark.sql(Q17_SQL)
