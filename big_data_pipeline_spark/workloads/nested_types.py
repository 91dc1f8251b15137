"""Nested-type surface: MapType and ArrayType operators.

The reference's data is flat (SURVEY.md §1.2), but the extension corpus
adds JSON props and token arrays; these queries pin down the map/array
operator semantics — parse-to-map, map explode, array distinct/sort/
membership/intersection — against DuckDB's JSON and LIST functions as
an independent implementation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_pipeline_spark.functions.text import tokenize
from big_data_pipeline_spark.io import read_table

# --- map explode: props JSON -> map -> per-key stats ------------------------


def map_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_table(spark, sf_dir, "events")
    kv = events.select(
        F.explode(F.from_json("props", "map<string,int>")).alias("key", "value")
    )
    return kv.groupBy("key").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("value").alias("min_v"),
        F.max("value").alias("max_v"),
        F.sum("value").alias("sum_v"),
    )


_MAP_SQL = """
SELECT k AS key, COUNT(*) AS n,
       MIN(CAST(json_extract(props::JSON, '$.' || k) AS INT)) AS min_v,
       MAX(CAST(json_extract(props::JSON, '$.' || k) AS INT)) AS max_v,
       CAST(SUM(CAST(json_extract(props::JSON, '$.' || k) AS INT)) AS BIGINT)
         AS sum_v
FROM (SELECT props, unnest(json_keys(props::JSON)) AS k FROM events)
GROUP BY k
"""


# --- array ops: distinct / sort / membership / intersection -----------------

_STOPS = ("the", "a", "of", "and", "to")


def array_ops_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    toks = tokenize("text")
    stop_arr = F.array(*[F.lit(s) for s in _STOPS])
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        F.element_at(F.array_sort(toks), 1).alias("first_sorted"),
        F.array_contains(toks, "the").alias("has_the"),
        F.size(F.array_intersect(F.array_distinct(toks), stop_arr)).alias(
            "n_stopword_kinds"
        ),
    )


_ARRAY_SQL = rf"""
WITH t AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents
)
SELECT doc_id,
       len(toks) AS n_tokens,
       len(list_distinct(toks)) AS n_distinct,
       list_sort(toks)[1] AS first_sorted,
       list_contains(toks, 'the') AS has_the,
       len(list_intersect(list_distinct(toks),
                          {list(_STOPS)})) AS n_stopword_kinds
FROM t
"""


# --- variant (Spark 4 semi-structured type): parse once, extract typed ------


def variant_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VariantType path for semi-structured JSON: ``parse_json``
    builds the binary variant encoding once, ``variant_get`` extracts
    typed fields with JSONPath. At scale this beats re-parsing the JSON
    string per extraction (variant decode is a binary-offset lookup,
    not a text parse), which is why it's the engine's recommended form
    for wide props objects; the single-key props here just pin the
    semantics against DuckDB's JSON extraction."""
    events = read_table(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json("props"), "$.k", "long")
    return (
        events.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count("k").alias("n_with_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.sum("k").alias("sum_k"),
        )
    )


_VARIANT_SQL = """
SELECT event_type, COUNT(*) AS n_events,
       COUNT(CAST(json_extract(props, '$.k') AS BIGINT)) AS n_with_k,
       MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS min_k,
       MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k,
       CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
FROM events GROUP BY event_type
"""


QUERIES = {
    "variant_props_stats": variant_props_stats,
    "map_props_stats": map_props_stats,
    "array_ops_tokens": array_ops_tokens,
}

ORACLE = {
    "variant_props_stats": _VARIANT_SQL,
    "map_props_stats": _MAP_SQL,
    "array_ops_tokens": _ARRAY_SQL,
}
