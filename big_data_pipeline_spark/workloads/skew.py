"""Skew-mitigation workload: salted plans oracle-checked against the
plain formulation — salting must never change results, only the
shuffle layout, so the DuckDB twin is simply the unsalted SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_pipeline_spark.io import read_table
from big_data_pipeline_spark.operators.skew import salted_aggregate, salted_join


def salted_agg_flag_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation on a deliberately low-cardinality
    key (3 return flags ← the skew shape: few keys, many rows)."""
    lineitem = read_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_quantity"
    )
    return salted_aggregate(
        lineitem,
        ["l_returnflag"],
        {
            "n_items": ("count", "*"),
            "min_qty": ("min", "l_quantity"),
            "max_qty": ("max", "l_quantity"),
        },
        n_salts=16,
    )


_SALTED_AGG_SQL = """
SELECT l_returnflag,
       COUNT(*) AS n_items,
       MIN(l_quantity) AS min_qty,
       MAX(l_quantity) AS max_qty
FROM lineitem
GROUP BY l_returnflag
"""


def salted_join_user_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted big x small join: events (hot user keys) against a small
    per-user dimension, then a count per segment to keep output compact."""
    events = read_table(spark, sf_dir, "events").select("user_id", "value")
    user_dim = (
        read_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("user_n"))
        .withColumn(
            "segment", F.when(F.col("user_n") >= 50, "heavy").otherwise("light")
        )
        .select("user_id", "segment")
    )
    joined = salted_join(events, user_dim, on=["user_id"], n_salts=8)
    return joined.groupBy("segment").agg(F.count(F.lit(1)).alias("n_events"))


_SALTED_JOIN_SQL = """
WITH user_dim AS (
  SELECT user_id,
         CASE WHEN COUNT(*) >= 50 THEN 'heavy' ELSE 'light' END AS segment
  FROM events GROUP BY user_id
)
SELECT segment, COUNT(*) AS n_events
FROM events JOIN user_dim USING (user_id)
GROUP BY segment
"""


QUERIES = {
    "salted_agg_flag_stats": salted_agg_flag_stats,
    "salted_join_user_events": salted_join_user_events,
}

ORACLE = {
    "salted_agg_flag_stats": _SALTED_AGG_SQL,
    "salted_join_user_events": _SALTED_JOIN_SQL,
}
