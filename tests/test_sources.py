"""Custom ticker DataSource: registration, partitioned read, determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_pipeline_spark.schema import normalize_schema
from big_data_pipeline_spark.sources import register_ticker_source


def test_ticker_source_reads_per_symbol(spark):
    register_ticker_source(spark)
    bars = (
        spark.read.format("ticker")
        .option("symbols", "AAPL,MSFT")
        .option("periods", "24")
        .load()
    )
    counts = dict(
        bars.groupBy("symbol").count().collect()[i][0:2] for i in range(2)
    )
    assert counts == {"AAPL": 24, "MSFT": 24}
    # one partition per symbol
    assert bars.rdd.getNumPartitions() == 2


def test_ticker_source_deterministic_and_normalizable(spark):
    register_ticker_source(spark)
    read = lambda: (  # noqa: E731
        spark.read.format("ticker")
        .option("symbols", "GOOG")
        .option("periods", "12")
        .load()
    )
    a, b = read().toPandas(), read().toPandas()
    assert a.equals(b)
    # timestamps are offset-aware strings; normalize_schema must parse them
    norm = normalize_schema(read())
    assert norm.filter(F.col("Datetime").isNull()).count() == 0
    assert dict(norm.dtypes)["Datetime"] == "timestamp"
