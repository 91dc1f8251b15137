"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementations live in ``big_data_pipeline_spark/workloads/``; this
module only merges and re-exports them.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = Path(__file__).resolve().parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

from big_data_pipeline_spark.workloads import (  # noqa: E402
    advanced,
    behavior,
    cdc_feed,
    clusters,
    data_quality,
    dedup,
    events,
    features,
    fingerprints,
    graph_rank,
    llm_pipeline,
    merge_workloads,
    multimodal,
    nested_types,
    pipeline_flagship,
    relational,
    runtime_filters,
    similarity,
    skew,
    streaming_surface,
    text,
    timeseries,
    tpch_like,
    tpch_subqueries,
    training_data,
    udxf_surface,
)

_MODULES = (
    relational,
    tpch_like,
    tpch_subqueries,
    advanced,
    behavior,
    events,
    timeseries,
    features,
    text,
    fingerprints,
    similarity,
    dedup,
    clusters,
    graph_rank,
    multimodal,
    nested_types,
    skew,
    runtime_filters,
    cdc_feed,
    llm_pipeline,
    streaming_surface,
    udxf_surface,
    data_quality,
    training_data,
    pipeline_flagship,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return relational.q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    q, _ = merge_workloads(*_MODULES)
    return q


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twins for every oracle-checkable query."""
    _, o = merge_workloads(*_MODULES)
    return o
