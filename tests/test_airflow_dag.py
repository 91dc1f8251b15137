"""Airflow DAG factory shim (VERDICT r5 item 7): construct the DAG
object against a stubbed airflow module (airflow isn't installed
here), verify the reference-shaped task ids / chain / retry defaults,
and run the stage callables for real through the stub to prove they
drive the actual pipeline."""

from __future__ import annotations

import datetime as dt
import sys
import types

import pytest


class _StubOperator:
    registry: list = []

    def __init__(self, task_id, python_callable):
        self.task_id = task_id
        self.python_callable = python_callable
        self.downstream: list[str] = []
        _StubOperator.registry.append(self)

    def __rshift__(self, other):
        self.downstream.append(other.task_id)
        return other


class _StubDag:
    def __init__(self, **kwargs):
        self.kwargs = kwargs

    def __enter__(self):
        _StubOperator.registry = []
        return self

    def __exit__(self, *exc):
        self.tasks = list(_StubOperator.registry)
        return False


@pytest.fixture
def stub_airflow(monkeypatch):
    af = types.ModuleType("airflow")
    af.DAG = _StubDag
    ops = types.ModuleType("airflow.operators")
    py = types.ModuleType("airflow.operators.python")
    py.PythonOperator = _StubOperator
    monkeypatch.setitem(sys.modules, "airflow", af)
    monkeypatch.setitem(sys.modules, "airflow.operators", ops)
    monkeypatch.setitem(sys.modules, "airflow.operators.python", py)
    return af


def test_dag_shape_matches_reference(stub_airflow, tmp_path):
    from big_data_pipeline_spark.airflow_dag import build_stock_pipeline_dag

    dag = build_stock_pipeline_dag(str(tmp_path / "lake"))
    assert dag.kwargs["dag_id"] == "stock_data_pipeline"
    assert dag.kwargs["schedule"] == "@daily"
    assert dag.kwargs["catchup"] is False
    # reference defaults: retries=1, retry_delay 5 min
    assert dag.kwargs["default_args"]["retries"] == 1
    assert dag.kwargs["default_args"]["retry_delay"] == dt.timedelta(
        seconds=300
    )
    ids = [t.task_id for t in dag.tasks]
    assert ids == [
        "ingest_data",
        "transform_data",
        "combine_data",
        "predict_future",
    ]
    # linear chain: each task points at exactly the next
    for up, down in zip(dag.tasks, dag.tasks[1:]):
        assert up.downstream == [down.task_id]
    assert dag.tasks[-1].downstream == []


def test_dag_callables_run_real_pipeline(stub_airflow, spark, tmp_path):
    from big_data_pipeline_spark.airflow_dag import build_stock_pipeline_dag

    lake = str(tmp_path / "lake")
    dag = build_stock_pipeline_dag(lake, spark_factory=lambda: spark)
    for t in dag.tasks:  # already in chain order
        t.python_callable()
    preds = spark.read.parquet(f"{lake}/predictions")
    assert preds.count() > 0
    assert "predicted_close" in preds.columns or preds.columns


def test_import_error_without_airflow(monkeypatch, tmp_path):
    # ensure the stub (and any real airflow) is absent
    import builtins

    for m in list(sys.modules):
        if m == "airflow" or m.startswith("airflow."):
            monkeypatch.delitem(sys.modules, m)
    real_import = builtins.__import__

    def no_airflow(name, *a, **k):
        if name == "airflow" or name.startswith("airflow."):
            raise ImportError(name)
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", no_airflow)
    from big_data_pipeline_spark.airflow_dag import build_stock_pipeline_dag

    with pytest.raises(ImportError, match="run_pipeline_with_retries"):
        build_stock_pipeline_dag(str(tmp_path))


def test_dag_falls_back_to_schedule_interval(stub_airflow, tmp_path):
    """Airflow 2.0-2.3 only accepts schedule_interval=; the factory must
    probe and fall back instead of TypeError-ing (ADVICE r6)."""

    class _LegacyDag(_StubDag):
        def __init__(self, **kwargs):
            if "schedule" in kwargs:
                raise TypeError(
                    "__init__() got an unexpected keyword argument "
                    "'schedule'"
                )
            super().__init__(**kwargs)

    stub_airflow.DAG = _LegacyDag
    from big_data_pipeline_spark.airflow_dag import build_stock_pipeline_dag

    dag = build_stock_pipeline_dag(str(tmp_path / "lake"))
    assert dag.kwargs["schedule_interval"] == "@daily"
    assert "schedule" not in dag.kwargs
    assert [t.task_id for t in dag.tasks] == [
        "ingest_data",
        "transform_data",
        "combine_data",
        "predict_future",
    ]
