"""Incremental transform: checkpointed drains process only new files."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_pipeline_spark.streaming.incremental import incremental_transform


def _write_raw(spark, raw_dir: str, symbol: str, n: int, start: int = 0):
    rows = [
        (f"2024-01-02 {9 + i}:30:00-05:00", 1.0, 2.0, 0.5, 1.5, 100 + i, symbol)
        for i in range(start, start + n)
    ]
    df = spark.createDataFrame(
        rows, ["Datetime", "Open", "High", "Low", "Close", "Volume", "symbol"]
    )
    df.coalesce(1).write.mode("append").json(f"{raw_dir}/batch_{symbol}_{start}")


def test_incremental_transform_is_exactly_once(spark, tmp_path):
    raw = str(tmp_path / "raw")
    processed = str(tmp_path / "processed")
    ckpt = str(tmp_path / "ckpt")

    _write_raw(spark, raw, "AAPL", 3)
    assert incremental_transform(spark, raw, processed, ckpt) >= 1
    first = spark.read.parquet(processed)
    assert first.count() == 3
    # offset-aware strings parsed by normalize_schema, not nulled
    assert first.filter(F.col("Datetime").isNull()).count() == 0

    # second drain with no new data: no new rows
    incremental_transform(spark, raw, processed, ckpt)
    assert spark.read.parquet(processed).count() == 3

    # new raw file arrives → only the delta is appended
    _write_raw(spark, raw, "MSFT", 2)
    incremental_transform(spark, raw, processed, ckpt)
    out = spark.read.parquet(processed)
    assert out.count() == 5
    assert out.filter("symbol = 'MSFT'").count() == 2
