"""Runtime-filter workload: Bloom-pruned join, oracle-checked.

Like the salted plans in ``workloads/skew.py``, the physical trick must
be invisible in the result: a Bloom pre-prune admits false positives
but never drops a true match, and the exact join afterwards removes the
false positives — so the DuckDB twin is simply the plain join SQL.

The dim side here (URGENT + finished orders) keeps ~1/15 of orders, so
at scale the prune drops ~93% of lineitem before the join shuffle. The
test suite additionally asserts the prune factor directly (see
tests/test_operators.py) — the oracle proves correctness, the test
proves it actually prunes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_pipeline_spark.io import read_table
from big_data_pipeline_spark.operators.bloom import bloom_pruned_join
from big_data_pipeline_spark.oracle import exact_sum, exact_sum_sql


def bloom_pruned_urgent_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_orderstatus") == "F")
    )
    lineitem = read_table(spark, sf_dir, "lineitem")
    return (
        bloom_pruned_join(lineitem, orders, "l_orderkey", "o_orderkey")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            exact_sum("l_extendedprice * (1 - l_discount)", "revenue"),
        )
    )


_BLOOM_SQL = f"""
SELECT l_returnflag, COUNT(*) AS n_items,
       {exact_sum_sql("l_extendedprice * (1 - l_discount)", "revenue")}
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderpriority = '1-URGENT' AND o_orderstatus = 'F'
GROUP BY l_returnflag
"""


QUERIES = {
    "bloom_pruned_urgent_revenue": bloom_pruned_urgent_revenue,
}

ORACLE = {
    "bloom_pruned_urgent_revenue": _BLOOM_SQL,
}
