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


def test_exact_sum_partition_invariant(spark):
    """The §7 determinism claim: the decimal-routed sum returns the
    SAME double at any parallelism (a raw double sum would not)."""
    pdf = pd.DataFrame({"x": [0.1 * i + 1e9 for i in range(1, 5000)]})
    results = set()
    for parts in (1, 3, 16, 64):
        df = spark.createDataFrame(pdf).repartition(parts)
        results.add(df.agg(exact_sum("x", "s")).first()["s"].hex())
    assert len(results) == 1, results


def test_dec_to_double_cast_correctly_rounded_beyond_2_53():
    """The sf0.1 regression pinned: DuckDB's direct DECIMAL→DOUBLE cast
    mis-rounds huge decimals; the VARCHAR route must agree with Python's
    correctly-rounded float() at every magnitude."""
    import duckdb

    from big_data_pipeline_spark.oracle import _dec_to_double_sql

    con = duckdb.connect()
    for digits in ("25133409346739793615322624",  # the observed ss value
                   "12345678901234567890123456789",
                   "99999999999999999999.999999"):
        got = con.execute(
            f"SELECT {_dec_to_double_sql(f'CAST({digits} AS DECIMAL(38,6))')}"
        ).fetchone()[0]
        assert got.hex() == float(digits).hex(), digits
