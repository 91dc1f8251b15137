"""Data-quality suite over orders as an oracle-checked query."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from big_data_pipeline_spark.io import read_table
from big_data_pipeline_spark.quality import (
    expect_accepted_values,
    expect_between,
    expect_not_null,
    expect_unique,
    run_expectations,
)

_STATUSES = ["O", "F", "P"]


def dq_orders_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass expectation suite on orders (see quality/expectations.py:
    all checks fuse into a single aggregation job)."""
    orders = read_table(spark, sf_dir, "orders")
    return run_expectations(
        orders,
        [
            expect_not_null("o_custkey"),
            expect_unique("o_orderkey"),
            expect_between("o_totalprice", 0.0, 1e7),
            expect_accepted_values("o_orderstatus", _STATUSES),
        ],
    )


_DQ_SQL = """
WITH agg AS (
  SELECT COUNT(*) AS n_rows,
         COUNT(CASE WHEN o_custkey IS NULL THEN 1 END) AS v_null,
         COUNT(o_orderkey) - COUNT(DISTINCT o_orderkey) AS v_uniq,
         COUNT(CASE WHEN NOT (o_totalprice BETWEEN 0.0 AND 1e7) THEN 1 END) AS v_range,
         COUNT(CASE WHEN o_orderstatus NOT IN ('O','F','P')
                      OR o_orderstatus IS NULL THEN 1 END) AS v_vals
  FROM orders
)
SELECT r.check, r.violations, agg.n_rows, r.violations = 0 AS passed
FROM agg, (
  SELECT 'not_null_o_custkey' AS check, v_null AS violations FROM agg
  UNION ALL SELECT 'unique_o_orderkey', v_uniq FROM agg
  UNION ALL SELECT 'between_o_totalprice', v_range FROM agg
  UNION ALL SELECT 'accepted_o_orderstatus', v_vals FROM agg
) r
"""


# --- zscore_outlier_orders: statistical anomaly flagging --------------------

# Shared formula text -> identical IEEE evaluation in both engines. All
# inputs are exact integer cents, so the doubles agree bit-for-bit.
_Z = "(xc - s / n) / sqrt((ss - s * s / n) / n)"
_Z_THRESHOLD = 1.5


def zscore_outlier_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flag orders whose total price sits in the far tail (>1.5
    population-sigma; the synthetic prices are uniform, so |z| is
    bounded by sqrt(3) and a 3-sigma rule can never fire) of their
    priority class — the anomaly-detection companion
    to the expectation suite above.

    Two-pass shape: tiny per-group moment aggregation (map-side
    combinable), broadcast back, z computed rowside in closed form from
    exact integer-cent sums. Z-scores are scale-invariant, so the cent
    scaling cancels and never needs undoing.
    """
    from pyspark.sql import functions as F

    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").alias("xc"),
    )
    moments = orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(F.col("xc").cast("decimal(38,0)")).cast("double").alias("s"),
        F.sum((F.col("xc") * F.col("xc")).cast("decimal(38,0)"))
        .cast("double")
        .alias("ss"),
    )
    return (
        orders.join(F.broadcast(moments), "o_orderpriority")
        .withColumn("zscore", F.expr(_Z))
        .filter(F.abs(F.col("zscore")) > _Z_THRESHOLD)
        .select("o_orderkey", "o_orderpriority", "o_totalprice", "zscore")
    )


_ZSCORE_SQL = f"""
WITH cents AS (
  SELECT o_orderkey, o_orderpriority, o_totalprice,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS xc
  FROM orders
),
moments AS (
  SELECT o_orderpriority,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(CAST(SUM(CAST(xc AS DECIMAL(38,0))) AS VARCHAR) AS DOUBLE) AS s,
         CAST(CAST(SUM(CAST(xc * xc AS DECIMAL(38,0))) AS VARCHAR) AS DOUBLE) AS ss
  FROM cents GROUP BY o_orderpriority
)
SELECT o_orderkey, c.o_orderpriority, o_totalprice, {_Z} AS zscore
FROM cents c JOIN moments m ON c.o_orderpriority = m.o_orderpriority
WHERE ABS({_Z}) > {_Z_THRESHOLD}
"""


# --- join_fanout_audit: pre-join blowup / hot-key sanity check --------------
# The pre-flight a 100 TB pipeline runs before an expensive join:
# per-key multiplicity on BOTH sides predicts the exact output
# cardinality (sum over keys of l_count*r_count), surfaces the max
# fan-out and how many hot keys exceed a threshold (salting
# candidates), and counts orphans on each side (referential leaks).
# Two map-side-combinable per-key counts + one full-outer equi-join on
# the key space + one global fold — all integer-exact.

_FANOUT_HOT = 8


def join_fanout_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    lkeys = (
        read_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderkey").alias("key"))
        .agg(F.count(F.lit(1)).alias("lc"))
    )
    rkeys = (
        read_table(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_orderkey").alias("key"))
        .agg(F.count(F.lit(1)).alias("rc"))
    )
    both = lkeys.join(rkeys, "key", "full_outer").select(
        F.coalesce("lc", F.lit(0)).alias("lc"),
        F.coalesce("rc", F.lit(0)).alias("rc"),
    )
    return both.agg(
        F.sum((F.col("lc") > 0).cast("long")).alias("n_left_keys"),
        F.sum((F.col("rc") > 0).cast("long")).alias("n_right_keys"),
        F.sum(F.col("lc") * F.col("rc")).alias("predicted_join_rows"),
        F.max(F.col("lc") * F.col("rc")).alias("max_key_fanout"),
        F.sum(
            ((F.col("lc") * F.col("rc")) >= _FANOUT_HOT).cast("long")
        ).alias("n_hot_keys"),
        F.sum(((F.col("rc") == 0)).cast("long")).alias("n_left_orphan_keys"),
        F.sum(((F.col("lc") == 0)).cast("long")).alias("n_right_orphan_keys"),
    )


_FANOUT_SQL = f"""
WITH lkeys AS (
  SELECT o_orderkey AS key, COUNT(*) AS lc FROM orders GROUP BY o_orderkey
),
rkeys AS (
  SELECT l_orderkey AS key, COUNT(*) AS rc FROM lineitem GROUP BY l_orderkey
),
keymult AS (
  SELECT COALESCE(lc, 0) AS lc, COALESCE(rc, 0) AS rc
  FROM lkeys FULL OUTER JOIN rkeys USING (key)
)
SELECT CAST(SUM(CASE WHEN lc > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_left_keys,
       CAST(SUM(CASE WHEN rc > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_right_keys,
       CAST(SUM(lc * rc) AS BIGINT) AS predicted_join_rows,
       CAST(MAX(lc * rc) AS BIGINT) AS max_key_fanout,
       CAST(SUM(CASE WHEN lc * rc >= {_FANOUT_HOT} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_hot_keys,
       CAST(SUM(CASE WHEN rc = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_left_orphan_keys,
       CAST(SUM(CASE WHEN lc = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_right_orphan_keys
FROM keymult
"""


QUERIES = {
    "dq_orders_report": dq_orders_report,
    "zscore_outlier_orders": zscore_outlier_orders,
    "join_fanout_audit": join_fanout_audit,
}
ORACLE = {
    "dq_orders_report": _DQ_SQL,
    "zscore_outlier_orders": _ZSCORE_SQL,
    "join_fanout_audit": _FANOUT_SQL,
}
