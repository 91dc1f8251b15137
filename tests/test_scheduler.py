"""G2 schedule/retry shim: per-stage retry over idempotent overwrite
sinks (reference ``dags/stock_pipeline_dag.py:14-27``)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from big_data_pipeline_spark import pipeline as p
from big_data_pipeline_spark.scheduler import (
    RetryPolicy,
    run_dag,
    run_pipeline_with_retries,
    run_stage_with_retries,
)


def test_stage_retry_succeeds_on_second_attempt():
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("transient")

    slept = []
    run = run_stage_with_retries(
        "flaky", flaky, RetryPolicy(retries=1, retry_delay_sec=7.0),
        sleep=slept.append,
    )
    assert run.succeeded and run.attempts == 2
    assert slept == [7.0]  # retry_delay honored between attempts


def test_stage_exhausts_retries():
    def always_fails():
        raise RuntimeError("boom")

    run = run_stage_with_retries(
        "bad", always_fails, RetryPolicy(retries=2, retry_delay_sec=0),
        sleep=lambda _: None,
    )
    assert not run.succeeded and run.attempts == 3
    assert "boom" in run.error


def test_dag_stops_at_failed_stage():
    order = []
    stages = [
        ("a", lambda: order.append("a")),
        ("b", lambda: (_ for _ in ()).throw(RuntimeError("dead"))),
        ("c", lambda: order.append("c")),
    ]
    rep = run_dag(stages, RetryPolicy(retries=0), sleep=lambda _: None)
    assert order == ["a"]  # c never attempted (upstream-failed)
    assert [r.name for r in rep.runs] == ["a", "b"]
    assert not rep.succeeded


def test_pipeline_mid_stage_failure_then_retry_is_idempotent(
    spark, tmp_path, monkeypatch
):
    """Inject one transform failure AFTER it has partially written its
    layer; the retry overwrites cleanly and the final predictions equal
    an uninterrupted run's."""
    cfg = p.PipelineConfig(base_dir=str(tmp_path / "lake"), periods=40)

    real_transform = p.transform
    state = {"n": 0}

    def flaky_transform(spark_, cfg_):
        state["n"] += 1
        if state["n"] == 1:
            real_transform(spark_, cfg_)  # partial/dirty attempt lands
            raise RuntimeError("worker lost after write")
        return real_transform(spark_, cfg_)

    monkeypatch.setattr(p, "transform", flaky_transform)
    rep = run_pipeline_with_retries(
        spark, cfg, RetryPolicy(retries=1, retry_delay_sec=0),
        sleep=lambda _: None,
    )
    assert rep.succeeded
    by_name = {r.name: r for r in rep.runs}
    assert by_name["transform"].attempts == 2
    assert by_name["predict"].attempts == 1

    # Idempotence: a clean, separate lake produces identical predictions.
    monkeypatch.setattr(p, "transform", real_transform)
    cfg2 = p.PipelineConfig(base_dir=str(tmp_path / "lake2"), periods=40)
    p.run_pipeline(spark, cfg2)

    a = spark.read.parquet(cfg.layer("predictions"))
    b = spark.read.parquet(cfg2.layer("predictions"))
    rows_a = sorted(map(tuple, a.select(sorted(a.columns)).collect()))
    rows_b = sorted(map(tuple, b.select(sorted(b.columns)).collect()))
    assert rows_a == rows_b
    assert a.filter(F.col("predicted_close").isNull()).count() == 0
