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


# --- key_skew_profile: the diagnostic you run BEFORE salting ----------------
# Shuffle-key distribution profiling: per-key row counts on the join/agg
# key, the top-10 hottest keys with their share of total rows and their
# ratio to the mean key load, plus the global key count on every row.
# This is the decision input for the two operators above (a key whose
# ratio_to_avg is ~1 never needs salting; a 100x key does) and for AQE's
# skew-join thresholds. All math is integer counts and single divisions
# of those counts — cross-engine exact with shared expression text.
#
# Scale (100 TB): one map-side-combinable count per key, one broadcast
# of a 1-row total, top-10 via TakeOrderedAndProject — the profile costs
# one shuffle of (key, partial-count) pairs regardless of input size.

_SKEW_TOP = 10
_SKEW_SHARE = "CAST(n_rows AS DOUBLE) / total_rows"
_SKEW_RATIO = "CAST(n_rows AS DOUBLE) * n_keys / total_rows"


def key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_table(spark, sf_dir, "events")
    per_key = events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    totals = per_key.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("n_rows").alias("total_rows"),
    )
    return (
        per_key.crossJoin(F.broadcast(totals))
        .select(
            "user_id",
            "n_rows",
            "n_keys",
            "total_rows",
            F.expr(_SKEW_SHARE).alias("share"),
            F.expr(_SKEW_RATIO).alias("ratio_to_avg"),
        )
        .orderBy(F.desc("n_rows"), "user_id")
        .limit(_SKEW_TOP)
    )


_SKEW_PROFILE_SQL = f"""
WITH per_key AS (
  SELECT user_id, COUNT(*) AS n_rows FROM events GROUP BY user_id
),
totals AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
         CAST(SUM(n_rows) AS BIGINT) AS total_rows
  FROM per_key
)
SELECT user_id, n_rows, n_keys, total_rows,
       {_SKEW_SHARE} AS share,
       {_SKEW_RATIO} AS ratio_to_avg
FROM per_key, totals
ORDER BY n_rows DESC, user_id
LIMIT {_SKEW_TOP}
"""


QUERIES = {
    "salted_agg_flag_stats": salted_agg_flag_stats,
    "salted_join_user_events": salted_join_user_events,
    "key_skew_profile": key_skew_profile,
}

ORACLE = {
    "salted_agg_flag_stats": _SALTED_AGG_SQL,
    "salted_join_user_events": _SALTED_JOIN_SQL,
    "key_skew_profile": _SKEW_PROFILE_SQL,
}
