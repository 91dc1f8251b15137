"""PageRank workload: rank nations by weighted trade flow.

Builds the nation→nation trade graph (supplier nation → customer
nation, weighted by lineitem revenue — the q7 join shape aggregated to
graph edges) and runs weighted PageRank over it. The power iteration is
not SQL-expressible (DuckDB's recursive CTEs can't carry the per-round
global dangling-mass scalar), so the driver check is rows-only; the
numeric truth check is a numpy power-iteration golden in
tests/test_graph.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_pipeline_spark.io import read_table
from big_data_pipeline_spark.operators.graph import pagerank
from big_data_pipeline_spark.oracle import exact_sum


def trade_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """supplier-nation → customer-nation edges weighted by revenue."""
    lineitem = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    supplier = read_table(spark, sf_dir, "supplier")
    customer = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("src")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("dst")
    )
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .groupBy("src", "dst")
        .agg(exact_sum("l_extendedprice * (1 - l_discount)", "revenue"))
    )


def pagerank_nation_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = trade_edges(spark, sf_dir)
    ranks = pagerank(edges, damping=0.85, max_iter=10, weight="revenue")
    return (
        ranks.select(
            F.col("id").alias("nation"), F.round("rank", 8).alias("rank")
        )
        .orderBy(F.desc("rank"), "nation")
    )


QUERIES = {
    "pagerank_nation_trade": pagerank_nation_trade,
}

ORACLE: dict[str, str] = {}
