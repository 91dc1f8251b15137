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


QUERIES = {
    "cdc_orders_diff": cdc_orders_diff,
}

ORACLE = {
    "cdc_orders_diff": _CDC_SQL,
}
