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


# --- fk_integrity_audit: schema-wide referential integrity ------------------
# The dbt-`relationships`-test shape as one query: for every declared
# FK edge of the corpus schema, count child rows, NULL FKs, orphan rows
# (non-NULL FK with no parent), and distinct orphan keys. join_fanout
# audits ONE join's multiplicity; this audits the whole schema's
# integrity — the gate a lake pipeline runs after every load, before
# downstream joins silently drop rows.
#
# Scale (100 TB): each edge is an independent left join of the child's
# FK column (one narrow projection — column pruning reaches the scan)
# against the parent's distinct key set; dimension parents broadcast,
# fact-fact edges shuffle on the FK — the same shape the production
# join would use, so the audit never costs more than the join it
# protects. Per-edge aggregates are single rows; the union is free.
# Both engines' queries are generated from the same relation list so
# they cannot drift.

_FK_RELATIONS = (
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
)


def fk_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from functools import reduce

    from pyspark.sql import functions as F

    parts = []
    for child, fk, parent, pk in _FK_RELATIONS:
        c = read_table(spark, sf_dir, child).select(F.col(fk).alias("fk"))
        p = (
            read_table(spark, sf_dir, parent)
            .select(F.col(pk).alias("pk"))
            .distinct()
        )
        orphan = F.col("fk").isNotNull() & F.col("pk").isNull()
        parts.append(
            c.join(p, F.col("fk") == F.col("pk"), "left").agg(
                F.lit(f"{child}.{fk}->{parent}.{pk}").alias("relation"),
                F.count(F.lit(1)).alias("n_child_rows"),
                # SUM over an empty child is NULL on both engines; an
                # empty table has zero violations, so pin 0
                F.coalesce(
                    F.sum(F.col("fk").isNull().cast("long")), F.lit(0)
                ).alias("n_null_fk"),
                F.coalesce(F.sum(orphan.cast("long")), F.lit(0)).alias(
                    "n_orphan_rows"
                ),
                F.count_distinct(
                    F.when(orphan, F.col("fk"))
                ).alias("n_orphan_keys"),
            )
        )
    return reduce(lambda a, b: a.unionAll(b), parts)


def _fk_audit_sql() -> str:
    selects = []
    for child, fk, parent, pk in _FK_RELATIONS:
        selects.append(f"""
SELECT '{child}.{fk}->{parent}.{pk}' AS relation,
       COUNT(*) AS n_child_rows,
       CAST(COALESCE(SUM(CASE WHEN fk IS NULL THEN 1 ELSE 0 END), 0)
            AS BIGINT) AS n_null_fk,
       CAST(COALESCE(SUM(CASE WHEN fk IS NOT NULL AND pk IS NULL
                         THEN 1 ELSE 0 END), 0)
            AS BIGINT) AS n_orphan_rows,
       COUNT(DISTINCT CASE WHEN fk IS NOT NULL AND pk IS NULL THEN fk END)
         AS n_orphan_keys
FROM (SELECT {fk} AS fk FROM {child}) c
LEFT JOIN (SELECT DISTINCT {pk} AS pk FROM {parent}) p ON c.fk = p.pk
""")
    return " UNION ALL ".join(selects)


QUERIES = {
    "dq_orders_report": dq_orders_report,
    "zscore_outlier_orders": zscore_outlier_orders,
    "join_fanout_audit": join_fanout_audit,
    "fk_integrity_audit": fk_integrity_audit,
}
ORACLE = {
    "dq_orders_report": _DQ_SQL,
    "zscore_outlier_orders": _ZSCORE_SQL,
    "join_fanout_audit": _FANOUT_SQL,
    "fk_integrity_audit": _fk_audit_sql(),
}
