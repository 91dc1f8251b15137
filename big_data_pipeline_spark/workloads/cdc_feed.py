"""CDC workload: snapshot diff oracle-checked against FULL OUTER SQL.

Two deterministic snapshots are derived from the orders fixture (no
synthetic data: both engines build identical frames from the same
parquet): ``before`` drops orderkeys ≡3 (mod 10); ``after`` drops
≡7 (mod 10) and shifts totalprice by +100 for keys ≡0 (mod 5) —
yielding all three op classes. The +100 shift (not a multiply+round)
keeps the changed values IEEE-exact on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_pipeline_spark.io import read_table
from big_data_pipeline_spark.operators.cdc import snapshot_diff


def cdc_orders_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    before = orders.filter(F.col("o_orderkey") % 10 != 3)
    after = orders.filter(F.col("o_orderkey") % 10 != 7).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 5 == 0, F.col("o_totalprice") + 100.0
        ).otherwise(F.col("o_totalprice")),
    )
    return snapshot_diff(
        before,
        after,
        keys=["o_orderkey"],
        compare_cols=["o_orderstatus", "o_totalprice"],
    )


_CDC_SQL = """
WITH before AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice
  FROM orders WHERE o_orderkey % 10 <> 3
),
after AS (
  SELECT o_orderkey, o_orderstatus,
         CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 100.0
              ELSE o_totalprice END AS o_totalprice
  FROM orders WHERE o_orderkey % 10 <> 7
)
SELECT CASE WHEN b.o_orderkey IS NULL THEN 'I'
            WHEN a.o_orderkey IS NULL THEN 'D'
            ELSE 'U' END AS op,
       COALESCE(a.o_orderkey, b.o_orderkey) AS o_orderkey,
       b.o_orderstatus AS o_orderstatus_before,
       a.o_orderstatus AS o_orderstatus_after,
       b.o_totalprice AS o_totalprice_before,
       a.o_totalprice AS o_totalprice_after
FROM after a FULL OUTER JOIN before b ON a.o_orderkey = b.o_orderkey
WHERE a.o_orderkey IS NULL OR b.o_orderkey IS NULL
   OR (a.o_orderstatus IS DISTINCT FROM b.o_orderstatus)
   OR (a.o_totalprice IS DISTINCT FROM b.o_totalprice)
"""


# --- scd2_priority_history: slowly-changing dimension, type 2 ---------------
# The operator (operators/scd.py) applied as a checkable query: a
# customer dimension tracking each customer's latest order priority,
# snapshotted at two cutoff dates. Batch 1 bootstraps the history;
# batch 2 closes rows whose priority changed (valid_to = T2) and opens
# fresh ones. The oracle reconstructs the same history with window
# functions + a changed-key join — a genuinely different formulation
# that must agree cell-exact, including null-safe change detection.
#
# Scale: each snapshot is one windowed latest-per-key (single shuffle
# on the dimension key); scd2_apply joins updates against CURRENT rows
# only and carries closed history through untouched — no history-sized
# window, no driver logic.

_SCD_T1 = "1997-01-01 00:00:00"
_SCD_T2 = "1999-01-01 00:00:00"


def scd2_priority_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from big_data_pipeline_spark.operators.scd import scd2_apply, scd2_init

    orders = read_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority", "o_orderdate", "o_orderkey"
    )

    def snap(cutoff: str) -> DataFrame:
        w = Window.partitionBy("o_custkey").orderBy(
            F.desc("o_orderdate"), F.desc("o_orderkey")
        )
        return (
            orders.filter(F.col("o_orderdate") < F.lit(cutoff).cast("timestamp"))
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select(
                "o_custkey",
                "o_orderpriority",
                F.lit(cutoff).cast("timestamp").alias("eff"),
            )
        )

    hist = scd2_init(snap(_SCD_T1), "eff")
    hist = scd2_apply(
        hist,
        snap(_SCD_T2),
        key_cols=["o_custkey"],
        tracked_cols=["o_orderpriority"],
        effective="eff",
    )
    return hist.select(
        "o_custkey", "o_orderpriority", "valid_from", "valid_to", "is_current"
    )


_SCD_SQL = f"""
WITH b1 AS (
  SELECT o_custkey, o_orderpriority FROM (
    SELECT o_custkey, o_orderpriority,
           ROW_NUMBER() OVER (PARTITION BY o_custkey
                              ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
    FROM orders WHERE o_orderdate < TIMESTAMP '{_SCD_T1}'
  ) WHERE rn = 1
),
b2 AS (
  SELECT o_custkey, o_orderpriority FROM (
    SELECT o_custkey, o_orderpriority,
           ROW_NUMBER() OVER (PARTITION BY o_custkey
                              ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
    FROM orders WHERE o_orderdate < TIMESTAMP '{_SCD_T2}'
  ) WHERE rn = 1
),
changed AS (
  SELECT b2.o_custkey, b2.o_orderpriority
  FROM b2 LEFT JOIN b1 USING (o_custkey)
  WHERE b1.o_custkey IS NULL
     OR b1.o_orderpriority IS DISTINCT FROM b2.o_orderpriority
)
SELECT b1.o_custkey, b1.o_orderpriority,
       TIMESTAMP '{_SCD_T1}' AS valid_from,
       CASE WHEN c.o_custkey IS NOT NULL
            THEN TIMESTAMP '{_SCD_T2}' END AS valid_to,
       c.o_custkey IS NULL AS is_current
FROM b1 LEFT JOIN changed c ON b1.o_custkey = c.o_custkey
UNION ALL
SELECT o_custkey, o_orderpriority,
       TIMESTAMP '{_SCD_T2}' AS valid_from,
       CAST(NULL AS TIMESTAMP) AS valid_to,
       TRUE AS is_current
FROM changed
"""


# --- scd2_asof_snapshot: point-in-time dimension read ------------------------
# The query SCD2 history exists to answer: the dimension's state AS OF
# time T — rows where valid_from <= T < coalesce(valid_to, ∞). T sits
# between the two snapshot batches, so the reconstruction must equal
# the direct latest-order-per-customer computation at the FIRST cutoff
# — the oracle computes that directly with a window, proving the
# history's validity ranges really carry the temporal semantics (a
# wrong valid_to/is_current would desync the two formulations).
# Scale: one filter over history (partition-prunable on valid_from in
# a date-partitioned layout) — the whole point of SCD2 is that PIT
# reads are scans, not replays.

_SCD_ASOF_T = "1998-06-01 00:00:00"


def scd2_asof_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = F.lit(_SCD_ASOF_T).cast("timestamp")
    hist = scd2_priority_history(spark, sf_dir)
    return hist.filter(
        (F.col("valid_from") <= t)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > t))
    ).select("o_custkey", "o_orderpriority")


_SCD_ASOF_SQL = f"""
SELECT o_custkey, o_orderpriority FROM (
  SELECT o_custkey, o_orderpriority,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
  FROM orders WHERE o_orderdate < TIMESTAMP '{_SCD_T1}'
) WHERE rn = 1
"""


QUERIES = {
    "cdc_orders_diff": cdc_orders_diff,
    "scd2_priority_history": scd2_priority_history,
    "scd2_asof_snapshot": scd2_asof_snapshot,
}

ORACLE = {
    "cdc_orders_diff": _CDC_SQL,
    "scd2_priority_history": _SCD_SQL,
    "scd2_asof_snapshot": _SCD_ASOF_SQL,
}
