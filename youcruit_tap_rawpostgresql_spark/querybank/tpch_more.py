"""Additional TPC-H-shaped relational cases: conditional-aggregate joins,
EXISTS-driven counts, nation-pair volume analysis, min-per-group correlated
lookup. Widens the delegated-SQL surface coverage (SURVEY.md §2.4-2.5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from youcruit_tap_rawpostgresql_spark.querybank.helpers import (
    O_REV,
    d,
    iso_date,
    rev_col,
)
from youcruit_tap_rawpostgresql_spark.querybank.registry import register, tables


@register(
    "q4_order_priority",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1997-10-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
  )
GROUP BY o_orderpriority
""",
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4: EXISTS-gated priority counts (semi join on the fact table).
    Scale: lineitem side only ships (l_orderkey, l_shipdate); the semi join
    never multiplies rows."""
    tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders o
        WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND o.o_orderdate < TIMESTAMP '1997-10-01 00:00:00'
          AND EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
          )
        GROUP BY o_orderpriority
        """
    )


@register(
    "q12_shipmode_buckets",
    oracle=f"""
SELECT o_orderpriority,
  COUNT(*) FILTER (WHERE l_quantity >= 25) AS high_line_count,
  COUNT(*) FILTER (WHERE l_quantity < 25) AS low_line_count,
  CAST(SUM({O_REV}) AS DOUBLE) AS revenue
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY o_orderpriority
""",
)
def q12_shipmode_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: join + conditional bucket counts."""
    t = tables(spark, sf_dir)
    l = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    return (
        t["orders"]
        .join(l, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.when(F.col("l_quantity") >= 25, 1)).alias("high_line_count"),
            F.count(F.when(F.col("l_quantity") < 25, 1)).alias("low_line_count"),
            F.sum(rev_col()).cast("double").alias("revenue"),
        )
    )


@register(
    "q14_promo_ratio",
    oracle=f"""
SELECT ROUND(
  100.0 * CAST(SUM(CASE WHEN p_type LIKE 'small%' THEN {O_REV} ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
        / CAST(SUM({O_REV}) AS DOUBLE), 9) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00'
""",
)
def q14_promo_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: global conditional-revenue ratio (broadcast dim
    join + single-row aggregate)."""
    t = tables(spark, sf_dir)
    l = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    joined = l.join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
    promo = F.sum(
        F.when(F.col("p_type").like("small%"), rev_col()).otherwise(
            F.lit(0).cast("decimal(12,2)")
        )
    ).cast("double")
    return joined.agg(
        F.round(F.lit(100.0) * promo / F.sum(rev_col()).cast("double"), 9).alias(
            "promo_revenue_pct"
        )
    )


@register(
    "q7_nation_volume",
    oracle=f"""
SELECT n1.n_name AS cust_nation, n2.n_name AS supp_nation,
  CAST(year(l_shipdate) AS INT) AS l_year,
  CAST(SUM({O_REV}) AS DOUBLE) AS volume
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE n1.n_nationkey <> n2.n_nationkey
  AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
""",
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: cross-nation trade volume by year (two aliased
    broadcast joins against the same dimension)."""
    t = tables(spark, sf_dir)
    n1 = t["nation"].select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    l = t["lineitem"].filter(
        F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp")
    )
    return (
        l.join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nk"))
        .filter(F.col("c_nk") != F.col("s_nk"))
        .groupBy("cust_nation", "supp_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(rev_col()).cast("double").alias("volume"))
    )


@register(
    "q17_small_quantity",
    oracle="""
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0 AS avg_yearly
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_brand = 'Brand#1'
  AND l.l_quantity < (
    SELECT 0.2 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(l2.l_quantity))
    FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey
  )
""",
)
def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar subquery (per-part average) —
    decorrelates to an aggregate + rejoin on partkey."""
    tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0 AS avg_yearly
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE p.p_brand = 'Brand#1'
          AND l.l_quantity < (
            SELECT 0.2 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(l2.l_quantity))
            FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey
          )
        """
    )


@register(
    "min_per_group_lookup",
    oracle="""
SELECT p.p_brand, p.p_partkey, p.p_retailprice
FROM part p
JOIN (
  SELECT p_brand AS b, MIN(p_retailprice) AS min_price
  FROM part GROUP BY p_brand
) m ON p.p_brand = m.b AND p.p_retailprice = m.min_price
""",
)
def min_per_group_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: rows matching their group's minimum (agg + rejoin)."""
    p = tables(spark, sf_dir)["part"]
    m = p.groupBy(F.col("p_brand").alias("b")).agg(
        F.min("p_retailprice").alias("min_price")
    )
    return (
        p.join(
            F.broadcast(m),
            (F.col("p_brand") == F.col("b"))
            & (F.col("p_retailprice") == F.col("min_price")),
        )
        .select("p_brand", "p_partkey", "p_retailprice")
    )


@register(
    "q10_returned_items",
    headline=True,
    oracle=f"""
SELECT c.c_custkey, c.c_name, n.n_name,
  CAST(SUM({O_REV}) AS DOUBLE) AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY revenue DESC, c.c_custkey LIMIT 20
""",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: top customers by returned-item revenue (4-way join +
    top-k). Scale: nation broadcast, orders filtered before the fact join,
    TakeOrderedAndProject top-20."""
    t = tables(spark, sf_dir)
    o = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    return (
        t["lineitem"]
        .filter(F.col("l_returnflag") == "R")
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(rev_col()).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@register(
    "q18_large_orders",
    oracle="""
SELECT o.o_orderkey, o.o_custkey, q.total_qty
FROM orders o JOIN (
  SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 150
) q ON o.o_orderkey = q.l_orderkey
""",
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING-filtered aggregate joined back to orders."""
    t = tables(spark, sf_dir)
    q = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.sum(d("l_quantity")).alias("qty_dec"))
        .filter(F.col("qty_dec") > 150)
        .select("l_orderkey", F.col("qty_dec").cast("double").alias("total_qty"))
    )
    return (
        t["orders"]
        .join(q, F.col("o_orderkey") == F.col("l_orderkey"))
        .select("o_orderkey", "o_custkey", "total_qty")
    )
