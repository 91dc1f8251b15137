"""Relational core workload: scan/filter/project/join/agg/set-op/sort/limit.

Covers SURVEY.md §2.2 (P8/P9/P12), §2.3 (joins — capability proof the
reference lacks), §2.4 (A1 union), §2.5 (A2 distinct, A4 count), §2.7
(O2 top-k), §2.8 (scalar functions). Every query here is paired with an
ANSI-SQL oracle; double sums go through ``oracle.exact_sum`` so hashes
are order-insensitive (SURVEY.md §7.4).

Scale notes (100 TB):
- q3/q5 join dimension tables that are orders of magnitude smaller than
  lineitem — Spark's broadcast threshold (session.py) turns all of them
  into broadcast hash joins; only fact-fact joins shuffle.
- Aggregations are partial-aggregate friendly (sum/count/min/max over
  low-cardinality group keys) — map-side combine collapses most data
  before any shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_pipeline_spark.io import read_table
from big_data_pipeline_spark.oracle import (
    exact_avg,
    exact_avg_sql,
    exact_sum,
    exact_sum_sql,
)

# --- q1_pricing_summary: TPC-H Q1-style grouped aggregate ------------------
# scan -> pushed filter -> partial agg -> final agg. The heaviest scan
# pattern at 100 TB; everything reduces map-side.

_Q1_CUTOFF = "1998-09-02"


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    sum_qty = exact_sum("l_quantity", "sum_qty")
    sum_base = exact_sum("l_extendedprice", "sum_base_price")
    sum_disc = exact_sum("l_extendedprice * (1 - l_discount)", "sum_disc_price")
    sum_charge = exact_sum(
        "l_extendedprice * (1 - l_discount) * (1 + l_tax)", "sum_charge"
    )
    avg_qty = exact_avg("l_quantity", "avg_qty")
    avg_price = exact_avg("l_extendedprice", "avg_price")
    avg_disc = exact_avg("l_discount", "avg_disc")
    return (
        read_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") <= F.lit(_Q1_CUTOFF).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            sum_qty,
            sum_base,
            sum_disc,
            sum_charge,
            avg_qty,
            avg_price,
            avg_disc,
            F.count(F.lit(1)).alias("count_order"),
        )
    )


_Q1_SQL = f"""
SELECT
  l_returnflag,
  l_linestatus,
  {exact_sum_sql("l_quantity", "sum_qty")},
  {exact_sum_sql("l_extendedprice", "sum_base_price")},
  {exact_sum_sql("l_extendedprice * (1 - l_discount)", "sum_disc_price")},
  {exact_sum_sql("l_extendedprice * (1 - l_discount) * (1 + l_tax)", "sum_charge")},
  {exact_avg_sql("l_quantity", "avg_qty")},
  {exact_avg_sql("l_extendedprice", "avg_price")},
  {exact_avg_sql("l_discount", "avg_disc")},
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{_Q1_CUTOFF} 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


# --- filter_project: pushed-down predicate + column pruning (P8/P9) --------


def filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        read_table(spark, sf_dir, "lineitem")
        .filter((F.col("l_quantity") >= 45) & (F.col("l_discount") > 0.05))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    )


_FILTER_PROJECT_SQL = """
SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
FROM lineitem
WHERE l_quantity >= 45 AND l_discount > 0.05
"""


# --- distinct_flag_status (A2) ---------------------------------------------


def distinct_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus"
    ).distinct()


_DISTINCT_SQL = "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem"


# --- union_orders_split (A1): union-all of two disjoint slices -------------


def union_orders_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    high = orders.filter(F.col("o_totalprice") >= 250000).select(
        "o_orderkey", "o_totalprice", F.lit("high").alias("bucket")
    )
    low = orders.filter(F.col("o_totalprice") < 50000).select(
        "o_orderkey", "o_totalprice", F.lit("low").alias("bucket")
    )
    return high.unionByName(low)


_UNION_SQL = """
SELECT o_orderkey, o_totalprice, 'high' AS bucket FROM orders WHERE o_totalprice >= 250000
UNION ALL
SELECT o_orderkey, o_totalprice, 'low' AS bucket FROM orders WHERE o_totalprice < 50000
"""


# --- topk_orders (O2): global top-k with deterministic tiebreak ------------


def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    # orderBy + limit compiles to TakeOrderedAndProject: per-partition
    # top-k then a k-row merge on the driver — no global sort shuffle.
    return (
        read_table(spark, sf_dir, "orders")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


_TOPK_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 10
"""


# --- q3_shipping_priority: 3-way join + grouped revenue + top-k ------------

_Q3_REVENUE_SQL_EXPR = "l_extendedprice * (1 - l_discount)"


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders")
    lineitem = read_table(spark, sf_dir, "lineitem")
    revenue = exact_sum(_Q3_REVENUE_SQL_EXPR, "revenue")
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .filter(
            (F.col("c_mktsegment") == "BUILDING")
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp"))
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(revenue)
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


_Q3_SQL = f"""
SELECT
  l_orderkey,
  o_orderdate,
  o_orderpriority,
  {exact_sum_sql(_Q3_REVENUE_SQL_EXPR, "revenue")}
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


# --- q5_local_supplier_volume: 6-way star join ------------------------------


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = read_table(spark, sf_dir, "region")
    nation = read_table(spark, sf_dir, "nation")
    customer = read_table(spark, sf_dir, "customer")
    supplier = read_table(spark, sf_dir, "supplier")
    orders = read_table(spark, sf_dir, "orders")
    lineitem = read_table(spark, sf_dir, "lineitem")
    revenue = exact_sum(_Q3_REVENUE_SQL_EXPR, "revenue")
    # Fact-fact join (lineitem x orders) shuffles on orderkey; every
    # dimension is broadcast. "Local supplier": supplier nation must
    # equal customer nation (TPC-H Q5 semantics).
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(supplier),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name").isin("ASIA", "EUROPE"))
        .groupBy("r_name", "n_name")
        .agg(revenue)
    )


_Q5_SQL = f"""
SELECT
  r_name,
  n_name,
  {exact_sum_sql(_Q3_REVENUE_SQL_EXPR, "revenue")}
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name IN ('ASIA', 'EUROPE')
GROUP BY r_name, n_name
"""


# --- scalar_functions (P12, §2.8): string/date/math projections ------------


def scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.lower("o_orderpriority").alias("priority_lower"),
        F.upper("o_orderstatus").alias("status_upper"),
        F.round("o_totalprice", 1).alias("price_round"),
        F.date_format("o_orderdate", "yyyy-MM").alias("order_month"),
        F.concat_ws("-", "o_orderstatus", "o_orderpriority").alias("status_priority"),
        F.length("o_orderpriority").alias("priority_len"),
        F.substring("o_orderpriority", 1, 1).alias("priority_code"),
    )


_SCALAR_SQL = """
SELECT
  o_orderkey,
  lower(o_orderpriority) AS priority_lower,
  upper(o_orderstatus) AS status_upper,
  round(o_totalprice, 1) AS price_round,
  strftime(o_orderdate, '%Y-%m') AS order_month,
  o_orderstatus || '-' || o_orderpriority AS status_priority,
  length(o_orderpriority) AS priority_len,
  substring(o_orderpriority, 1, 1) AS priority_code
FROM orders
"""


# --- grouped_agg_stats (A4 + min/max/avg over a dimension) ------------------


def grouped_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    avg_bal = exact_avg("c_acctbal", "avg_acctbal")
    return (
        read_table(spark, sf_dir, "customer")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.min("c_acctbal").alias("min_acctbal"),
            F.max("c_acctbal").alias("max_acctbal"),
            avg_bal,
        )
    )


_GROUPED_AGG_SQL = f"""
SELECT
  c_mktsegment,
  COUNT(*) AS n_customers,
  MIN(c_acctbal) AS min_acctbal,
  MAX(c_acctbal) AS max_acctbal,
  {exact_avg_sql("c_acctbal", "avg_acctbal")}
FROM customer
GROUP BY c_mktsegment
"""


# --- having_count_filter (P11: small-group guard as HAVING) -----------------


def having_count_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        read_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") >= 3)
    )


_HAVING_SQL = """
SELECT o_custkey, COUNT(*) AS n_orders
FROM orders
GROUP BY o_custkey
HAVING COUNT(*) >= 3
"""


# --- lineitem_measures_unpivot: wide -> long reshaping ----------------------
# The inverse of event_type_pivot closes the reshape pair: unpivot the
# four lineitem measures into (measure, value) rows and aggregate per
# (returnflag, measure). Spark 4's native unpivot (melt) keeps this a
# pure narrow map — a 4x fan-out with no shuffle until the aggregate,
# same shape as explode — and the agg on 3x4 keys collapses map-side.
# Long form is what generic metric stores and plotting layers consume;
# at 100 TB the narrow fan-out beats 4 separate scans of the fact
# table. Exact decimal sums keep the hash order-insensitive.

_UNPIVOT_MEASURES = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


def lineitem_measures_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    long = li.unpivot(
        ids=["l_returnflag"],
        values=[F.col(m).cast("double").alias(m) for m in _UNPIVOT_MEASURES],
        variableColumnName="measure",
        valueColumnName="value",
    )
    return long.groupBy("l_returnflag", "measure").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
        exact_sum("value", "sum_value"),
    )


def _unpivot_sql() -> str:
    arms = " UNION ALL ".join(
        f"SELECT l_returnflag, '{m}' AS measure, CAST({m} AS DOUBLE) AS value"
        f" FROM lineitem"
        for m in _UNPIVOT_MEASURES
    )
    return f"""
WITH long AS ({arms})
SELECT l_returnflag, measure, COUNT(*) AS n_rows,
       MIN(value) AS min_value, MAX(value) AS max_value,
       {exact_sum_sql("value", "sum_value")}
FROM long GROUP BY l_returnflag, measure
"""


# --- sql_text_interface: ONE SQL text, both engines --------------------------
# The EP3 programmatic surface proven end-to-end: io.register_views
# exposes the lake by name and the IDENTICAL ANSI text runs through
# spark.sql(...) AND the DuckDB oracle — no DataFrame translation in
# between, so dialect-intersection SQL (explicit BIGINT casts for
# COUNT, exact DECIMAL sums, VARCHAR-routed decimal→double) is proven
# portable, not just equivalent. Catalyst still plans it like any
# DataFrame query: pushdown/pruning apply to the view scan.

_SQL_TEXT = """
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS VARCHAR(64))
            AS DOUBLE) AS revenue
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
GROUP BY o_orderpriority
"""


def sql_text_interface(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_pipeline_spark.io import register_views

    register_views(spark, sf_dir)
    return spark.sql(_SQL_TEXT)


# --- keyset_pagination_page: OFFSET-free pagination ---------------------------
# The pagination pattern that survives scale: instead of
# ORDER BY … OFFSET n (which scans and discards n rows per page —
# quadratic across a full export), the page is anchored at the last
# row of the previous page with a keyset predicate on the total order
# (o_totalprice DESC, o_orderkey ASC). The predicate prunes at the
# scan, and the page itself compiles to TakeOrderedAndProject — every
# page costs one bounded top-k, independent of page number.

_PAGE_ANCHOR_PRICE = 150000.0
_PAGE_ANCHOR_KEY = 0
_PAGE_SIZE = 10


def keyset_pagination_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    after = (F.col("o_totalprice") < _PAGE_ANCHOR_PRICE) | (
        (F.col("o_totalprice") == _PAGE_ANCHOR_PRICE)
        & (F.col("o_orderkey") > _PAGE_ANCHOR_KEY)
    )
    return (
        read_table(spark, sf_dir, "orders")
        .filter(after)
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(_PAGE_SIZE)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


_KEYSET_SQL = f"""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
WHERE o_totalprice < {_PAGE_ANCHOR_PRICE}
   OR (o_totalprice = {_PAGE_ANCHOR_PRICE}
       AND o_orderkey > {_PAGE_ANCHOR_KEY})
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT {_PAGE_SIZE}
"""


# --- theil_inequality_decomposition: between/within revenue inequality ------
# The Theil-T index over order values, decomposed by customer nation:
# T_total = (1/(N·μ)) Σ x_i ln(x_i/μ) splits EXACTLY into
# T_between = Σ_g (S_g/S) ln(μ_g/μ) plus a within-group remainder —
# the additive-decomposability property that makes Theil (not Gini)
# the inequality measure warehouses use for "how much inequality is
# ACROSS markets vs INSIDE them".
#
# Exactness discipline: order values become exact integer cents;
# ln(x_i/μ) = ln(cents_i·N / S) is a micro-log of an exact-integer
# ratio, and both Σ cents_i·micro_i (total) and Σ S_g·micro_g
# (between) accumulate as integers through DECIMAL(38,0) with ONE
# terminal division each — partial-agg order cannot show (the KL/zipf
# pattern). T_within is the difference of the two exact terms.
#
# Scale: one row pass with the (N, S) scalar broadcast, one
# nation-sized groupBy. Nothing else.


def theil_inequality_decomposition(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    customer = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nation = read_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nationkey"),
        F.col("n_name").alias("nation"),
    )
    rows = orders.join(
        F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey")
    ).join(F.broadcast(nation), "c_nationkey")
    tot = rows.agg(
        F.count(F.lit(1)).alias("n"), F.sum("cents").alias("s")
    )
    j = rows.crossJoin(F.broadcast(tot))
    # Scale-dependent integer products route through DECIMAL(38,0):
    # cents*n reaches ~8e18 at the sf10 stress corpus (within a hair of
    # int64) and s_g*n / s*n_g reach ~1e22 — BIGINT multiply threw
    # ARITHMETIC_OVERFLOW at sf10 (r9 stress). The exact integer then
    # converts to double round-to-nearest identically on both engines
    # (the oracle twin uses HUGEINT in the same positions), so values
    # at the driver's scales are unchanged.
    micro_i = F.round(
        F.log(
            (F.col("cents").cast("decimal(38,0)") * F.col("n")).cast(
                "double"
            )
            / F.col("s").cast("double")
        )
        * 1_000_000
    ).cast("bigint")
    total_term = j.agg(
        F.max("n").alias("n"),
        F.max("s").alias("s"),
        F.sum((F.col("cents") * micro_i).cast("decimal(38,0)")).alias(
            "t_sum"
        ),
    )
    grp = (
        rows.groupBy("nation")
        .agg(F.count(F.lit(1)).alias("n_g"), F.sum("cents").alias("s_g"))
        .crossJoin(F.broadcast(tot))
    )
    micro_g = F.round(
        F.log(
            (F.col("s_g").cast("decimal(38,0)") * F.col("n")).cast("double")
            / (F.col("s").cast("decimal(38,0)") * F.col("n_g")).cast(
                "double"
            )
        )
        * 1_000_000
    ).cast("bigint")
    between_term = grp.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum(F.col("s_g").cast("decimal(38,0)") * micro_g).cast(
            "decimal(38,0)"
        ).alias("b_sum"),
    )
    out = total_term.crossJoin(F.broadcast(between_term))
    t_total = F.col("t_sum").cast("double") / (
        F.col("s").cast("double") * 1_000_000.0
    )
    t_between = F.col("b_sum").cast("double") / (
        F.col("s").cast("double") * 1_000_000.0
    )
    return out.select(
        F.col("n").alias("n_orders"),
        "n_groups",
        t_total.alias("theil_total"),
        t_between.alias("theil_between"),
        (t_total - t_between).alias("theil_within"),
    )


_THEIL_SQL = """
WITH rows_ AS (
  SELECT n.n_name AS nation,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n ON c_nationkey = n.n_nationkey
),
tot AS (SELECT COUNT(*) AS n, CAST(SUM(cents) AS BIGINT) AS s FROM rows_),
total_term AS (
  SELECT MAX(n) AS n, MAX(s) AS s,
         SUM(CAST(cents * CAST(round(ln(CAST(CAST(cents AS HUGEINT) * n
                                               AS DOUBLE)
                                        / CAST(s AS DOUBLE)) * 1000000)
                               AS BIGINT) AS DECIMAL(38,0))) AS t_sum
  FROM rows_, tot
),
grp AS (
  SELECT nation, COUNT(*) AS n_g, CAST(SUM(cents) AS BIGINT) AS s_g
  FROM rows_ GROUP BY nation
),
between_term AS (
  SELECT COUNT(*) AS n_groups,
         SUM(CAST(CAST(s_g AS HUGEINT)
                  * CAST(round(ln(CAST(CAST(s_g AS HUGEINT) * n AS DOUBLE)
                                  / CAST(CAST(s AS HUGEINT) * n_g AS DOUBLE))
                               * 1000000)
                         AS BIGINT) AS DECIMAL(38,0))) AS b_sum
  FROM grp, tot
)
SELECT CAST(n AS BIGINT) AS n_orders,
       CAST(n_groups AS BIGINT) AS n_groups,
       CAST(CAST(t_sum AS VARCHAR) AS DOUBLE)
         / (CAST(s AS DOUBLE) * 1000000.0) AS theil_total,
       CAST(CAST(b_sum AS VARCHAR) AS DOUBLE)
         / (CAST(s AS DOUBLE) * 1000000.0) AS theil_between,
       CAST(CAST(t_sum AS VARCHAR) AS DOUBLE)
         / (CAST(s AS DOUBLE) * 1000000.0)
         - CAST(CAST(b_sum AS VARCHAR) AS DOUBLE)
         / (CAST(s AS DOUBLE) * 1000000.0) AS theil_within
FROM total_term, between_term
"""


QUERIES = {
    "theil_inequality_decomposition": theil_inequality_decomposition,
    "keyset_pagination_page": keyset_pagination_page,
    "sql_text_interface": sql_text_interface,
    "q1_pricing_summary": q1_pricing_summary,
    "filter_project": filter_project,
    "distinct_flag_status": distinct_flag_status,
    "union_orders_split": union_orders_split,
    "topk_orders": topk_orders,
    "q3_shipping_priority": q3_shipping_priority,
    "q5_local_supplier_volume": q5_local_supplier_volume,
    "scalar_functions": scalar_functions,
    "grouped_agg_stats": grouped_agg_stats,
    "having_count_filter": having_count_filter,
    "lineitem_measures_unpivot": lineitem_measures_unpivot,
}

ORACLE = {
    "theil_inequality_decomposition": _THEIL_SQL,
    "sql_text_interface": _SQL_TEXT,
    "keyset_pagination_page": _KEYSET_SQL,
    "q1_pricing_summary": _Q1_SQL,
    "filter_project": _FILTER_PROJECT_SQL,
    "distinct_flag_status": _DISTINCT_SQL,
    "union_orders_split": _UNION_SQL,
    "topk_orders": _TOPK_SQL,
    "q3_shipping_priority": _Q3_SQL,
    "q5_local_supplier_volume": _Q5_SQL,
    "scalar_functions": _SCALAR_SQL,
    "grouped_agg_stats": _GROUPED_AGG_SQL,
    "having_count_filter": _HAVING_SQL,
    "lineitem_measures_unpivot": _unpivot_sql(),
}
