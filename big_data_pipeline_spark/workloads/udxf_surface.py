"""UDAF + UDTF surface as oracle-checked queries (§2.10 completion)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
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


QUERIES = {
    "median_order_value": median_order_value,
    "bigram_explode_udtf": bigram_explode_udtf,
}

ORACLE = {
    "median_order_value": _MEDIAN_SQL,
    "bigram_explode_udtf": _BIGRAM_SQL,
}
