"""exact_sum/exact_avg must be order-insensitive and match their SQL twins.

Both engines must start from identical float64 values (as they do when
reading the same parquet), so the DuckDB side queries a registered
pandas frame — SQL literals would parse as DECIMAL and diverge.
"""

from __future__ import annotations

import duckdb
import pandas as pd

from big_data_pipeline_spark.oracle import (
    exact_avg,
    exact_avg_sql,
    exact_sum,
    exact_sum_sql,
)


def _duck(pdf: pd.DataFrame, select: str) -> float:
    con = duckdb.connect()
    con.register("t", pdf)
    return con.execute(f"SELECT {select} FROM t").fetchone()[0]


def test_exact_sum_matches_duckdb(spark):
    pdf = pd.DataFrame({"x": [0.1 * i for i in range(1, 1000)]})
    df = spark.createDataFrame(pdf).repartition(8)
    got = df.agg(exact_sum("x * 2.0", "s")).first()["s"]
    want = _duck(pdf, exact_sum_sql("x * 2.0", "s"))
    assert got == want  # exact equality — that's the whole point


def test_exact_avg_matches_duckdb(spark):
    pdf = pd.DataFrame({"x": [1.0 / i for i in range(1, 500)]})
    df = spark.createDataFrame(pdf).repartition(7)
    got = df.agg(exact_avg("x", "a")).first()["a"]
    want = _duck(pdf, exact_avg_sql("x", "a"))
    assert got == want
