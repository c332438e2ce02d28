"""Final TPC-H-shaped cases (Q2/Q9/Q11/Q15), completing all 22 classic query
shapes over the delegated-SQL surface (SURVEY.md §2.4-2.7; the reference ships
arbitrary SQL to PostgreSQL at tap_rawpostgresql/client.py:300-304, so every
shape here is part of its API contract).

The fixture schema has no ``partsupp`` table (TESTDATA.md), so the
part-supplier relation is derived from ``lineitem`` (l_partkey, l_suppkey):
Q2's "min supply cost" becomes min extended price per part, Q9's supply cost
proxy is p_retailprice, Q11's stock value is lineitem revenue per part.
The relational *shapes* — correlated min-per-group subquery, multi-dim
profit rollup, HAVING against an uncorrelated scalar subquery, view + global
max — are preserved exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from youcruit_tap_rawpostgresql_spark.querybank.helpers import O_REV
from youcruit_tap_rawpostgresql_spark.querybank.registry import register, tables


@register(
    "q2_min_cost_supplier",
    oracle="""
SELECT DISTINCT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_name
FROM part p
JOIN lineitem l ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE p.p_size < 10 AND p.p_type = 'LARGE' AND r.r_name = 'EUROPE'
  AND l.l_extendedprice = (
    SELECT MIN(l2.l_extendedprice)
    FROM lineitem l2
    JOIN supplier s2 ON s2.s_suppkey = l2.l_suppkey
    JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
    JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
    WHERE l2.l_partkey = p.p_partkey AND r2.r_name = 'EUROPE'
  )
""",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: cheapest supplier per part in a region via a
    correlated min subquery (Catalyst decorrelates to an aggregate + join).
    Scale: the region/nation dims broadcast; the min-per-part aggregate is a
    partial-agg-friendly shuffle on l_partkey, no row multiplication."""
    tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT DISTINCT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_name
        FROM part p
        JOIN lineitem l ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE p.p_size < 10 AND p.p_type = 'LARGE' AND r.r_name = 'EUROPE'
          AND l.l_extendedprice = (
            SELECT MIN(l2.l_extendedprice)
            FROM lineitem l2
            JOIN supplier s2 ON s2.s_suppkey = l2.l_suppkey
            JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
            JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
            WHERE l2.l_partkey = p.p_partkey AND r2.r_name = 'EUROPE'
          )
        """
    )


@register(
    "q9_product_profit",
    oracle=f"""
SELECT n.n_name AS nation, EXTRACT(YEAR FROM o.o_orderdate) AS o_year,
  CAST(SUM({O_REV}
    - CAST(p.p_retailprice AS DECIMAL(12,2)) * CAST(0.10 AS DECIMAL(12,2))
      * CAST(l.l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_profit
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN part p ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE p.p_name LIKE '%red%'
GROUP BY nation, o_year
""",
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation and order year for parts
    matching a name pattern (supply cost proxied as 10% of p_retailprice —
    no partsupp in the fixture schema). Scale: the SELECTIVE part join
    (~5% '%red%' survivors) comes FIRST in join order — Catalyst keeps the
    textual inner-join order, and the r13 plan audit showed orders joining
    first, so ~95% of fact rows paid the orders hash probe only to be
    dropped at the part join; all dims broadcast; one shuffle for the
    final group-by."""
    tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT n.n_name AS nation, EXTRACT(YEAR FROM o.o_orderdate) AS o_year,
          CAST(SUM(
            CAST(l.l_extendedprice AS DECIMAL(12,2))
              * (CAST(1 AS DECIMAL(12,2)) - CAST(l.l_discount AS DECIMAL(12,2)))
            - CAST(p.p_retailprice AS DECIMAL(12,2)) * CAST(0.10 AS DECIMAL(12,2))
              * CAST(l.l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_profit
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        WHERE p.p_name LIKE '%red%'
        GROUP BY nation, o_year
        """
    )


@register(
    "q11_important_stock",
    oracle=f"""
SELECT l.l_partkey AS p_key, CAST(SUM({O_REV}) AS DOUBLE) AS part_value
FROM lineitem l
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE n.n_name = 'NATION_7'
GROUP BY l.l_partkey
HAVING SUM({O_REV}) > (
  SELECT SUM({O_REV}) * CAST(0.0015 AS DECIMAL(10,4))
  FROM lineitem l2
  JOIN supplier s2 ON s2.s_suppkey = l2.l_suppkey
  JOIN nation n2 ON n2.n_nationkey = s2.s_nationkey
  WHERE n2.n_name = 'NATION_7'
)
""",
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part value for one nation's suppliers, HAVING
    above a fraction of the nation total (uncorrelated scalar subquery —
    Spark plans it as a one-row broadcast, the base relation is computed
    twice; at scale, cache the filtered join if re-use matters).
    Decimal-exact sums on both sides so the > comparison agrees bitwise."""
    tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT l.l_partkey AS p_key,
          CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
            * (CAST(1 AS DECIMAL(12,2)) - CAST(l.l_discount AS DECIMAL(12,2))))
            AS DOUBLE) AS part_value
        FROM lineitem l
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        WHERE n.n_name = 'NATION_7'
        GROUP BY l.l_partkey
        HAVING SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
            * (CAST(1 AS DECIMAL(12,2)) - CAST(l.l_discount AS DECIMAL(12,2)))) > (
          SELECT SUM(CAST(l2.l_extendedprice AS DECIMAL(12,2))
              * (CAST(1 AS DECIMAL(12,2)) - CAST(l2.l_discount AS DECIMAL(12,2))))
            * CAST(0.0015 AS DECIMAL(10,4))
          FROM lineitem l2
          JOIN supplier s2 ON s2.s_suppkey = l2.l_suppkey
          JOIN nation n2 ON n2.n_nationkey = s2.s_nationkey
          WHERE n2.n_name = 'NATION_7'
        )
        """
    )


@register(
    "q15_top_supplier",
    oracle=f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no, CAST(SUM({O_REV}) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM supplier s
JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
""",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: quarterly per-supplier revenue view, pick the max
    via an uncorrelated scalar subquery over the same CTE. Spark evaluates
    the CTE twice (no auto-materialization) — both are one pruned scan +
    partial agg; supplier side broadcasts."""
    tables(spark, sf_dir)
    return spark.sql(
        """
        WITH revenue AS (
          SELECT l_suppkey AS supplier_no,
            CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
              * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))))
              AS DOUBLE) AS total_revenue
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
            AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
          GROUP BY l_suppkey
        )
        SELECT s.s_suppkey, s.s_name, r.total_revenue
        FROM supplier s
        JOIN revenue r ON s.s_suppkey = r.supplier_no
        WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
        """
    )
