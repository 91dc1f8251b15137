"""UDAF + UDTF surface as oracle-checked queries (§2.10 completion)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from big_data_pipeline_spark.functions.udxf import (
    BigramEmitter,
    exact_median,
    exact_p90,
)
from big_data_pipeline_spark.io import read_table

_BIGRAM_DOCS = 100


def median_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped exact median via a GROUPED_AGG pandas UDF.

    Rank statistics are order-insensitive, so unlike float sums this
    UDAF hash-matches DuckDB's ``median`` directly (both interpolate
    the middle pair on even counts)."""
    return (
        read_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        # GROUPED_AGG pandas UDFs can't mix with JVM aggregates in one
        # agg (INVALID_PANDAS_UDF_PLACEMENT) — so both stats are pandas
        .agg(
            exact_median("o_totalprice").alias("median_total"),
            exact_p90("o_totalprice").alias("p90_total"),
        )
    )


_MEDIAN_SQL = """
SELECT o_orderpriority, median(o_totalprice) AS median_total,
       quantile_cont(o_totalprice, 0.9) AS p90_total
FROM orders GROUP BY o_orderpriority
"""


# --- winsorized robust aggregate --------------------------------------------
# Outlier-robust group statistics: clamp each order's value to its
# group's exact [p05, p95] band, then average — the robust mean a
# quality dashboard prefers over AVG when a few fat-finger rows skew a
# group. The per-group band comes from the exact-quantile UDAF factory
# (pinned quantile_cont interpolation, DuckDB-bit-identical); the band
# frame is |groups| rows and broadcasts back; the clamped average is
# the exact-decimal route. Group count is small here (5 priorities) so
# the holistic UDAF's task-per-group cost is bounded — the 100 TB
# escape hatch for high-cardinality groups is the score-histogram
# quantile of quality_quantile_gate (training_data.py).

_P_LO, _P_HI = 0.05, 0.95


def winsorized_priority_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from big_data_pipeline_spark.functions.udxf import exact_quantile_udaf
    from big_data_pipeline_spark.oracle import exact_avg

    p05 = exact_quantile_udaf(_P_LO)
    p95 = exact_quantile_udaf(_P_HI)
    orders = read_table(spark, sf_dir, "orders")
    band = orders.groupBy("o_orderpriority").agg(
        p05("o_totalprice").alias("p05"),
        p95("o_totalprice").alias("p95"),
    )
    clamped = orders.join(F.broadcast(band), "o_orderpriority").withColumn(
        "clamped", F.least(F.greatest(F.col("o_totalprice"), F.col("p05")), F.col("p95"))
    )
    return clamped.groupBy("o_orderpriority").agg(
        F.first("p05").alias("p05"),
        F.first("p95").alias("p95"),
        exact_avg("o_totalprice", "raw_avg"),
        exact_avg("clamped", "winsorized_avg"),
    )


def _winsorized_sql() -> str:
    from big_data_pipeline_spark.oracle import exact_avg_sql

    return f"""
WITH band AS (
  SELECT o_orderpriority,
         quantile_cont(o_totalprice, {_P_LO}) AS p05,
         quantile_cont(o_totalprice, {_P_HI}) AS p95
  FROM orders GROUP BY o_orderpriority
),
clamped AS (
  SELECT o.o_orderpriority, o.o_totalprice, b.p05, b.p95,
         LEAST(GREATEST(o.o_totalprice, b.p05), b.p95) AS clamped
  FROM orders o JOIN band b USING (o_orderpriority)
)
SELECT o_orderpriority, ANY_VALUE(p05) AS p05, ANY_VALUE(p95) AS p95,
       {exact_avg_sql("o_totalprice", "raw_avg")},
       {exact_avg_sql("clamped", "winsorized_avg")}
FROM clamped GROUP BY o_orderpriority
"""


def bigram_explode_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF via lateralJoin: one doc row → one row per adjacent
    token pair. Doc subset keeps the check bounded; the plan is the
    same at any cardinality (UDTF fans out per input partition)."""
    docs = (
        read_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < _BIGRAM_DOCS)
        .select("doc_id", "text")
    )
    return docs.lateralJoin(BigramEmitter(F.col("text").outer())).select(
        "doc_id", "pos", "bigram"
    )


_BIGRAM_SQL = f"""
WITH t AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS arr
  FROM documents WHERE doc_id < {_BIGRAM_DOCS}
)
SELECT doc_id,
       unnest(generate_series(1, greatest(len(arr) - 1, 0))) - 1 AS pos,
       arr[unnest(generate_series(1, greatest(len(arr) - 1, 0)))]
         || ' ' ||
       arr[unnest(generate_series(1, greatest(len(arr) - 1, 0))) + 1] AS bigram
FROM t
"""


def rolling_median_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact rolling median of each user's last 5 event values, in
    closed JVM form: sort the frame's collected values and take the
    middle (averaging the two middles for even counts — exactly
    DuckDB's interpolation at q=0.5). collect_list/sort_array skip
    NULLs like median does.

    The GROUPED_AGG pandas UDAF (`functions/udxf.exact_median`) also
    runs ``.over(w)`` directly and hash-matches the same oracle
    (proven in tests/test_udxf.py) — but a windowed UDAF pays one
    Arrow round-trip PER FRAME (measured 6.1s vs 1.3s at sf0.1 for
    100k 5-row frames), so the hot path stays codegen'd and the UDAF
    form is reserved for statistics with no closed form."""
    events = read_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, Window.currentRow)
    )
    arr = F.sort_array(F.collect_list("value").over(w))
    n = F.size(arr)
    return events.select(
        "user_id",
        "event_id",
        F.when(
            n % 2 == 1,
            F.try_element_at(arr, ((n + 1) / 2).cast("int")),
        )
        .otherwise(
            (
                F.try_element_at(arr, (n / 2).cast("int"))
                + F.try_element_at(arr, (n / 2 + 1).cast("int"))
            )
            / 2.0
        )
        .alias("rolling_median_value"),
    )


_ROLLING_MEDIAN_SQL = """
SELECT user_id, event_id,
       median(value) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS rolling_median_value
FROM events
"""


QUERIES = {
    "median_order_value": median_order_value,
    "winsorized_priority_revenue": winsorized_priority_revenue,
    "bigram_explode_udtf": bigram_explode_udtf,
    "rolling_median_user_value": rolling_median_user_value,
}

ORACLE = {
    "median_order_value": _MEDIAN_SQL,
    "winsorized_priority_revenue": _winsorized_sql(),
    "bigram_explode_udtf": _BIGRAM_SQL,
    "rolling_median_user_value": _ROLLING_MEDIAN_SQL,
}
