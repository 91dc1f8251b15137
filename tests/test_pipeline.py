"""End-to-end test of the 4-stage pipeline (G1-G3) on a temp lake."""

from __future__ import annotations

import os

from big_data_pipeline_spark.pipeline import (
    PipelineConfig,
    run_pipeline,
    synthetic_bars,
)


def test_synthetic_bars_deterministic_and_dirty():
    a = synthetic_bars("AAPL", 10, seed=42)
    b = synthetic_bars("AAPL", 10, seed=42)
    assert a.equals(b)
    # ingested shape: suffixed columns, string timestamps with offset
    assert "Close_AAPL" in a.columns
    assert "symbol" not in a.columns
    assert a["Datetime"].iloc[0].endswith(":00")
    assert "-05:00" in a["Datetime"].iloc[0] or "-04:00" in a["Datetime"].iloc[0]


def test_run_pipeline_end_to_end(spark, tmp_path):
    cfg = PipelineConfig(base_dir=str(tmp_path), periods=48)
    preds = run_pipeline(spark, cfg).toPandas()

    # every layer materialized
    for layer in ("raw", "processed", "combined", "predictions"):
        assert os.path.isdir(tmp_path / layer), layer

    # processed/ is symbol-partitioned → partition pruning on read
    assert os.path.isdir(tmp_path / "processed" / "symbol=AAPL")

    # one prediction row per symbol, reference output schema
    assert sorted(preds["symbol"]) == ["AAPL", "GOOG", "MSFT"]
    assert set(preds.columns) == {"symbol", "predicted_close", "last_date", "mse"}
    assert (preds["mse"] >= 0).all()

    # canonical schema survived normalize: offset timestamps parsed, not nulled
    combined = spark.read.parquet(str(tmp_path / "combined"))
    assert combined.filter("Datetime IS NULL").count() == 0
    assert combined.count() == 48 * 3


def test_pipeline_rerun_is_idempotent(spark, tmp_path):
    cfg = PipelineConfig(base_dir=str(tmp_path), periods=30)
    first = run_pipeline(spark, cfg).toPandas()
    second = run_pipeline(spark, cfg).toPandas()  # overwrite semantics (S12)
    a = first.sort_values("symbol").reset_index(drop=True)
    b = second.sort_values("symbol").reset_index(drop=True)
    assert a.equals(b)
