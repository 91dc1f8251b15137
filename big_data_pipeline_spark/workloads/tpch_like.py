"""TPC-H-inspired workload, adapted to the fixture star schema.

Each query reproduces the *plan shape* of a classic TPC-H query using
the columns the corpus has (no partsupp/shipmode tables): existential
subqueries, disjunctive multi-table predicates, ratio aggregates,
grouped HAVING + IN subqueries, and scalar-subquery filters. Together
with workloads/relational.py (Q1/Q3/Q5 analogs) these pin down the
relational surface a reference user would expect.

Scale notes: every query is one or two shuffles — existential checks
are semi/anti joins (never row-duplicating), scalar subqueries
broadcast a 1-row frame, and all date/price predicates sit in the
parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_pipeline_spark.io import read_table
from big_data_pipeline_spark.oracle import exact_sum, exact_sum_sql

# --- q4-like: order-priority count with EXISTS(late lineitem) ---------------


def q4_priority_with_late_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    late = read_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-06-01").cast("timestamp")
    )
    return (
        orders.join(
            late, orders.o_orderkey == late.l_orderkey, "left_semi"
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


_Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey = o_orderkey AND l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
)
GROUP BY o_orderpriority
"""


# --- q12-like: two-bucket conditional count by urgency -----------------------


def q12_urgency_shipping_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    lineitem = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_quantity") >= 25)
        & (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
    )
    urgent = F.when(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
    ).otherwise(0)
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(urgent).alias("high_priority_count"),
            F.sum(1 - urgent).alias("low_priority_count"),
        )
    )


_Q12_SQL = """
SELECT l_returnflag,
       SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END)
         AS high_priority_count,
       SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END)
         AS low_priority_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_quantity >= 25 AND l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_returnflag
"""


# --- q14-like: promo revenue ratio (conditional / total) --------------------


def q14_brand_revenue_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")
    rev = "l_extendedprice * (1 - l_discount)"
    promo = F.when(F.col("p_type").startswith("PROMO"), F.expr(rev)).otherwise(
        F.lit(0.0)
    )
    joined = lineitem.join(
        F.broadcast(part), F.col("l_partkey") == F.col("p_partkey")
    )
    return joined.agg(
        (
            F.sum(promo.cast("decimal(38,6)")).cast("double")
            * 100.0
            / F.sum(F.expr(rev).cast("decimal(38,6)")).cast("double")
        ).alias("promo_revenue_pct")
    )


_Q14_SQL = """
SELECT CAST(SUM(CAST(CASE WHEN p_type LIKE 'PROMO%'
                          THEN l_extendedprice * (1 - l_discount)
                          ELSE 0.0 END AS DECIMAL(38,6))) AS DOUBLE) * 100.0
       / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE)
         AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
"""


# --- q18-like: large-volume orders via grouped HAVING + IN ------------------


def q18_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer")
    big_orders = (
        lineitem.groupBy("l_orderkey")
        .agg(exact_sum("l_quantity", "total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    return (
        big_orders.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .select("c_name", "o_orderkey", "o_totalprice", "total_qty")
    )


_Q18_SQL = f"""
WITH big AS (
  SELECT l_orderkey, {exact_sum_sql("l_quantity", "total_qty")}
  FROM lineitem GROUP BY l_orderkey HAVING total_qty > 150
)
SELECT c_name, o_orderkey, o_totalprice, total_qty
FROM big
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
"""


# --- q19-like: disjunctive multi-column predicates ---------------------------


def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")
    cond = (
        (F.col("p_brand") == "Brand#1")
        & (F.col("l_quantity") >= 10)
        & (F.col("p_size") <= 10)
    ) | (
        (F.col("p_brand") == "Brand#3")
        & (F.col("l_quantity") >= 30)
        & (F.col("p_size") <= 25)
    )
    return (
        lineitem.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(exact_sum("l_extendedprice * (1 - l_discount)", "revenue"))
    )


_Q19_SQL = f"""
SELECT {exact_sum_sql("l_extendedprice * (1 - l_discount)", "revenue")}
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND l_quantity >= 10 AND p_size <= 10)
   OR (p_brand = 'Brand#3' AND l_quantity >= 30 AND p_size <= 25)
"""


# --- q22-like: above-average-balance customers idle since mid-1998 ----------
# (every fixture customer has *some* order, so the anti-join is
# time-bounded to keep the result set non-trivial)

_Q22_CUTOFF = "1998-06-01"


def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = read_table(spark, sf_dir, "customer")
    recent = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit(_Q22_CUTOFF).cast("timestamp")
    )
    avg_bal = customer.agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(38,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("a")
    )
    return (
        customer.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(recent, customer.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            exact_sum("c_acctbal", "total_bal"),
        )
    )


_Q22_SQL = f"""
WITH avg_bal AS (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) AS a
  FROM customer
)
SELECT c_mktsegment, COUNT(*) AS n_customers,
       {exact_sum_sql("c_acctbal", "total_bal")}
FROM customer, avg_bal
WHERE c_acctbal > a
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey
      AND o_orderdate >= TIMESTAMP '{_Q22_CUTOFF} 00:00:00'
  )
GROUP BY c_mktsegment
"""


QUERIES = {
    "q4_priority_with_late_items": q4_priority_with_late_items,
    "q12_urgency_shipping_buckets": q12_urgency_shipping_buckets,
    "q14_brand_revenue_ratio": q14_brand_revenue_ratio,
    "q18_large_volume_orders": q18_large_volume_orders,
    "q19_disjunctive_revenue": q19_disjunctive_revenue,
    "q22_idle_rich_customers": q22_idle_rich_customers,
}

ORACLE = {
    "q4_priority_with_late_items": _Q4_SQL,
    "q12_urgency_shipping_buckets": _Q12_SQL,
    "q14_brand_revenue_ratio": _Q14_SQL,
    "q18_large_volume_orders": _Q18_SQL,
    "q19_disjunctive_revenue": _Q19_SQL,
    "q22_idle_rich_customers": _Q22_SQL,
}
