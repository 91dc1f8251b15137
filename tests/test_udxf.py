"""UDAF (GROUPED_AGG pandas) + UDTF unit checks."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_pipeline_spark.functions.udxf import (
    BigramEmitter,
    exact_median,
    exact_p90,
)


def test_exact_median_odd_even(spark):
    df = spark.createDataFrame(
        [(1, 1.0), (1, 9.0), (1, 2.0), (2, 4.0), (2, 8.0)], ["k", "v"]
    )
    got = {r.k: r.m for r in df.groupBy("k").agg(exact_median("v").alias("m")).collect()}
    assert got == {1: 2.0, 2: 6.0}  # odd picks middle, even interpolates


def test_exact_p90_matches_duckdb_formula(spark):
    import duckdb
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(7)
    pdf = pd.DataFrame({"k": rng.integers(0, 3, 101), "v": rng.uniform(0, 1e6, 101)})
    got = {
        r.k: r.p
        for r in spark.createDataFrame(pdf)
        .groupBy("k")
        .agg(exact_p90("v").alias("p"))
        .collect()
    }
    con = duckdb.connect()
    con.register("t", pdf)
    for k, want in con.sql("select k, quantile_cont(v, 0.9) from t group by k").fetchall():
        assert got[k] == want, k  # bit-identical, not approx


def test_bigram_udtf_edges(spark):
    df = spark.createDataFrame(
        [(0, "a  b\tc"), (1, "single"), (2, ""), (3, None)], ["doc_id", "text"]
    )
    rows = df.lateralJoin(BigramEmitter(F.col("text").outer())).select(
        "doc_id", "pos", "bigram"
    ).collect()
    got = {(r.doc_id, r.pos): r.bigram for r in rows}
    assert got == {(0, 0): "a b", (0, 1): "b c"}  # 1/0-token docs emit nothing


def test_exact_p90_and_median_skip_nulls_like_duckdb(spark):
    """Regression: NULLs must be ignored (DuckDB quantile semantics),
    not poison the interpolation into NaN."""
    import duckdb
    import pandas as pd

    pdf = pd.DataFrame({"k": [1] * 5, "v": [1.0, 2.0, None, 4.0, 5.0]})
    got = (
        spark.createDataFrame(pdf)
        .groupBy("k")
        .agg(exact_p90("v").alias("p"), exact_median("v").alias("m"))
        .collect()[0]
    )
    con = duckdb.connect()
    con.register("t", pdf)
    want_p, want_m = con.sql(
        "select quantile_cont(v, 0.9), median(v) from t"
    ).fetchone()
    assert got.p == want_p and got.m == want_m


def test_grouped_agg_udaf_as_window_function(spark):
    """The GROUPED_AGG pandas UDAF must work .over(a window frame) and
    reproduce DuckDB's interpolated median per frame — the capability
    the closed-form rolling query's docstring points here for."""
    from pyspark.sql import Window

    from big_data_pipeline_spark.functions.udxf import exact_median

    df = spark.createDataFrame(
        [("a", 1, 1.0), ("a", 2, 3.0), ("a", 3, 2.0), ("a", 4, 10.0)],
        "k string, i long, v double",
    )
    w = Window.partitionBy("k").orderBy("i").rowsBetween(-2, 0)
    got = {
        r.i: r.m
        for r in df.select(
            "i", exact_median("v").over(w).alias("m")
        ).collect()
    }
    # frames: [1], [1,3], [1,3,2], [3,2,10]
    assert got == {1: 1.0, 2: 2.0, 3: 2.0, 4: 3.0}
