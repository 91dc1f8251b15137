"""Market-basket association over orders (co-occurrence, support, lift).

The classic frequent-itemset / association-rule primitive (Agrawal &
Srikant, VLDB 1994) at the pairwise level: treating each order as a
basket of its distinct parts, rank part pairs by lift — how much more
often two parts ship together than independence predicts. The same
shape powers "documents that co-cite", "tokens that co-occur", and
feature co-selection audits in a training-data pipeline.

Scale (100 TB): the pair enumeration is a self-equi-join on the basket
key, so its fan-out is sum over baskets of k*(k-1)/2 with k = basket
size — bounded by the order schema (a TPC-H-ish order has ~4-7 lines),
NOT by corpus size; there is no cross join anywhere. Item frequencies
are one map-side-combinable count; the basket total is a broadcast
1-row scalar. The final top-k goes through TakeOrderedAndProject, never
a global sort. A basket source with unbounded k (pathological carts)
would cap k per basket first, the same guard token_cooccurrence_topk
uses (workloads/text.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_pipeline_spark.io import read_table

_MIN_PAIR_SUPPORT = 2
_TOP_K = 100
# one shared arithmetic text: identical IEEE op stream in both engines
_LIFT = "CAST(n_pair AS DOUBLE) * n_orders / n1 / n2"
_SUPPORT = "CAST(n_pair AS DOUBLE) / n_orders"


def part_affinity_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    baskets = (
        read_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    item_n = baskets.groupBy(F.col("l_partkey").alias("part")).agg(
        F.count(F.lit(1)).alias("n_item")
    )
    n_orders = baskets.select("l_orderkey").distinct().agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    a, b = baskets.alias("a"), baskets.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part1"),
            F.col("b.l_partkey").alias("part2"),
        )
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .filter(F.col("n_pair") >= _MIN_PAIR_SUPPORT)
    )
    n1 = item_n.select(
        F.col("part").alias("part1"), F.col("n_item").alias("n1")
    )
    n2 = item_n.select(
        F.col("part").alias("part2"), F.col("n_item").alias("n2")
    )
    return (
        pairs.join(n1, "part1")
        .join(n2, "part2")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "part1",
            "part2",
            "n_pair",
            "n1",
            "n2",
            F.expr(_SUPPORT).alias("support"),
            F.expr(_LIFT).alias("lift"),
        )
        .orderBy(F.desc("lift"), "part1", "part2")
        .limit(_TOP_K)
    )


_AFFINITY_SQL = f"""
WITH baskets AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
item_n AS (
  SELECT l_partkey AS part, COUNT(*) AS n_item FROM baskets GROUP BY l_partkey
),
totals AS (
  SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM baskets
),
pairs AS (
  SELECT a.l_partkey AS part1, b.l_partkey AS part2, COUNT(*) AS n_pair
  FROM baskets a JOIN baskets b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY a.l_partkey, b.l_partkey
  HAVING COUNT(*) >= {_MIN_PAIR_SUPPORT}
)
SELECT part1, part2, n_pair, n1, n2,
       {_SUPPORT} AS support,
       {_LIFT} AS lift
FROM pairs
JOIN (SELECT part AS part1, n_item AS n1 FROM item_n) USING (part1)
JOIN (SELECT part AS part2, n_item AS n2 FROM item_n) USING (part2)
CROSS JOIN totals
ORDER BY lift DESC, part1, part2
LIMIT {_TOP_K}
"""


QUERIES = {
    "part_affinity_lift": part_affinity_lift,
}
ORACLE = {
    "part_affinity_lift": _AFFINITY_SQL,
}
