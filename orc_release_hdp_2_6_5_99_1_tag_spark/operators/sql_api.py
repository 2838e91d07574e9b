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


# ---------------------------------------------------------------------------
# Round 4: the remaining TPC-H shapes (q8, q9, q11, q12, q13, q19,
# q20, q21), adapted to the reduced testdata schema (no partsupp /
# shipmode / commitdate columns — the join/subquery STRUCTURE is the
# point; lineitem stands in for partsupp where needed). One SQL string
# per query runs verbatim on Spark and DuckDB.
# ---------------------------------------------------------------------------

Q8_SQL = """
SELECT o_year,
       CAST(CAST(SUM(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END)
            / SUM(volume) AS DECIMAL(18,6)) AS DOUBLE) AS mkt_share
FROM (
  SELECT EXTRACT(YEAR FROM o.o_orderdate) AS o_year,
         CAST(l.l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l.l_discount AS DECIMAL(8,4)) AS volume,
         n2.n_name AS nation
  FROM part p
  JOIN lineitem l ON l.l_partkey = p.p_partkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
  JOIN region r ON r.r_regionkey = n1.n_regionkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n2 ON n2.n_nationkey = s.s_nationkey
  WHERE r.r_name = 'ASIA' AND p.p_type = 'STANDARD'
) all_nations
GROUP BY o_year
ORDER BY o_year
"""


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: 8-table snowflake join + conditional-aggregate
    market share per year. The deepest join tree in the suite —
    Catalyst's join reordering and broadcast selection carry it."""
    _register(
        spark, sf_dir,
        ["part", "lineitem", "orders", "customer", "nation", "region", "supplier"],
    )
    return spark.sql(Q8_SQL)


Q9_SQL = """
SELECT nation, o_year,
       CAST(SUM(amount) AS DOUBLE) AS sum_profit
FROM (
  SELECT n.n_name AS nation,
         EXTRACT(YEAR FROM o.o_orderdate) AS o_year,
         CAST(l.l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l.l_discount AS DECIMAL(8,4))
           - CAST(p.p_retailprice AS DECIMAL(18,2)) * CAST(l.l_quantity AS DECIMAL(18,2))
             * CAST(0.10 AS DECIMAL(4,2)) AS amount
  FROM part p
  JOIN lineitem l ON l.l_partkey = p.p_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  WHERE p.p_name LIKE '%e%'
) profit
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
"""


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by nation × year over a part-name LIKE
    filter (supply cost replaced by a retail-price fraction — the
    reduced schema has no partsupp)."""
    _register(spark, sf_dir, ["part", "lineitem", "supplier", "orders", "nation"])
    return spark.sql(Q9_SQL)


Q11_SQL = """
SELECT l.l_partkey,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS value
FROM lineitem l
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE n.n_name = 'NATION_7'
GROUP BY l.l_partkey
HAVING SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * CAST(l.l_quantity AS DECIMAL(18,2))) > (
  SELECT SUM(CAST(l2.l_extendedprice AS DECIMAL(18,2)) * CAST(l2.l_quantity AS DECIMAL(18,2)))
         * CAST(0.001 AS DECIMAL(6,4))
  FROM lineitem l2
  JOIN supplier s2 ON s2.s_suppkey = l2.l_suppkey
  JOIN nation n2 ON n2.n_nationkey = s2.s_nationkey
  WHERE n2.n_name = 'NATION_7'
)
ORDER BY value DESC, l_partkey
"""


def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: HAVING against an uncorrelated scalar subquery
    (global-fraction threshold) — lineitem stands in for partsupp."""
    _register(spark, sf_dir, ["lineitem", "supplier", "nation"])
    return spark.sql(Q11_SQL)


Q12_SQL = """
SELECT l.l_returnflag,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders o
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= DATE '1997-01-01' AND l.l_shipdate < DATE '1999-01-01'
GROUP BY l.l_returnflag
ORDER BY l.l_returnflag
"""


def q12_priority_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: join + conditional counts split by priority
    class over a shipdate range (returnflag stands in for shipmode)."""
    _register(spark, sf_dir, ["orders", "lineitem"])
    return spark.sql(Q12_SQL)


Q13_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c
  LEFT OUTER JOIN orders o
    ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: LEFT OUTER JOIN with an ON-clause filter (kept
    customers with zero orders count as c_count 0), double grouping."""
    _register(spark, sf_dir, ["customer", "orders"])
    return spark.sql(Q13_SQL)


Q19_SQL = """
SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
              * CAST(1 - l.l_discount AS DECIMAL(8,4))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#11' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity >= 1 AND l.l_quantity <= 21)
   OR (p.p_brand = 'Brand#21' AND p.p_size BETWEEN 1 AND 25
       AND l.l_quantity >= 10 AND l.l_quantity <= 30)
   OR (p.p_brand = 'Brand#22' AND p.p_size BETWEEN 1 AND 35
       AND l.l_quantity >= 20 AND l.l_quantity <= 40)
"""


def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs join predicate — the disjunction
    must still evaluate as a single hash join with a residual filter,
    not a cross product."""
    _register(spark, sf_dir, ["lineitem", "part"])
    return spark.sql(Q19_SQL)


Q20_SQL = """
SELECT s.s_name, s.s_acctbal
FROM supplier s
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE n.n_name = 'NATION_3'
  AND s.s_suppkey IN (
    SELECT l.l_suppkey
    FROM lineitem l
    WHERE l.l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
      AND l.l_shipdate >= DATE '1997-01-01'
    GROUP BY l.l_suppkey
    HAVING SUM(l.l_quantity) > 500
  )
ORDER BY s.s_name
"""


def q20_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: nested IN subqueries (semi-join into semi-join)
    with a grouped HAVING threshold inside."""
    _register(spark, sf_dir, ["supplier", "nation", "lineitem", "part"])
    return spark.sql(Q20_SQL)


Q21_SQL = """
SELECT s.s_name, COUNT(*) AS numwait
FROM supplier s
JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE o.o_orderstatus = 'F'
  AND l1.l_returnflag = 'R'
  AND n.n_name = 'NATION_5'
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_returnflag = 'R'
  )
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
"""


def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: EXISTS + NOT EXISTS both correlated to the
    outer lineitem — the hardest decorrelation in the suite
    (returnflag 'R' stands in for receipt-after-commit lateness)."""
    _register(spark, sf_dir, ["supplier", "lineitem", "orders", "nation"])
    return spark.sql(Q21_SQL)
