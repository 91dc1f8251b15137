"""Oracle-checked query workloads.

Each module exposes ``QUERIES: dict[str, (spark, sf_dir) -> DataFrame]``
and ``ORACLE: dict[str, str]`` (ANSI SQL DuckDB runs on the same parquet
tables). ``__spark_entry__.py`` merges them for the driver. A query key
present in QUERIES but absent from ORACLE gets the driver's weaker
rows-only check (reserved for genuinely non-SQL-expressible ops).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


def merge_workloads(*modules) -> tuple[dict[str, QueryFn], dict[str, str]]:
    queries: dict[str, QueryFn] = {}
    oracle: dict[str, str] = {}
    for m in modules:
        overlap = queries.keys() & m.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        queries.update(m.QUERIES)
        oracle.update(m.ORACLE)
    missing = oracle.keys() - queries.keys()
    if missing:
        raise ValueError(f"oracle entries without queries: {missing}")
    return queries, oracle
