"""Airflow-compatible DAG factory for the stock pipeline.

The reference schedules its four ETL stages as Airflow
``PythonOperator``s chained ``ingest >> transform >> combine >>
predict`` (reference ``dags/stock_pipeline_dag.py:29-50``). This
module is the drop-in equivalent for a user migrating from the
reference: :func:`build_stock_pipeline_dag` produces a real
``airflow.DAG`` wired to this engine's pipeline stages
(``pipeline.ingest/transform/combine/predict``), with the reference's
``retries=1`` / 5-minute ``retry_delay`` defaults
(``stock_pipeline_dag.py:17-18``).

Airflow is NOT a dependency of this engine — the import is gated
inside the factory, so the module itself always imports, and callers
without airflow get a clear error only when they actually build a DAG.
Environments without airflow keep the self-contained scheduler
(``scheduler.run_pipeline_with_retries``), which implements the same
retry/upstream-failed semantics without the airflow runtime.

Execution model note (why each stage builds its own SparkSession):
Airflow runs each task instance in its own worker process, possibly on
a different machine and hours apart — a session object captured at DAG
definition time would be dead by execution time. Each stage callable
therefore resolves its SparkSession lazily via ``spark_factory`` at
RUN time, and stages hand data to each other only through the layered
lake (bucket-mediated handoff, SURVEY §2 G3) — never through driver
memory — exactly the property that lets the same DAG run on
distributed Airflow workers.
"""

from __future__ import annotations

import datetime as _dt
from collections.abc import Callable

from big_data_pipeline_spark.pipeline import PipelineConfig

_STAGES = ("ingest", "transform", "combine", "predict")


def _stage_callable(
    stage: str,
    cfg: PipelineConfig,
    spark_factory: Callable | None,
):
    """A zero-arg callable running one pipeline stage against a fresh
    (or factory-provided) SparkSession — importable/pickleable work
    unit for an airflow worker."""

    def run():
        from big_data_pipeline_spark import pipeline as p

        if spark_factory is not None:
            spark = spark_factory()
        else:
            from big_data_pipeline_spark.session import get_spark

            spark = get_spark(f"stock-pipeline-{stage}")
        return getattr(p, stage)(spark, cfg)

    run.__name__ = f"run_{stage}"
    return run


def build_stock_pipeline_dag(
    base_dir: str,
    dag_id: str = "stock_data_pipeline",
    schedule: str = "@daily",
    start_date: _dt.datetime | None = None,
    retries: int = 1,
    retry_delay_sec: float = 300.0,
    catchup: bool = False,
    cfg: PipelineConfig | None = None,
    spark_factory: Callable | None = None,
):
    """Build the reference-shaped Airflow DAG over this engine.

    Mirrors ``dags/stock_pipeline_dag.py``: four ``PythonOperator``s
    chained linearly, ``@daily`` schedule, ``catchup=False``,
    ``retries``/``retry_delay`` in ``default_args``. Returns the
    ``airflow.DAG``; raises ``ImportError`` with a pointer to the
    airflow-free scheduler when airflow is absent.
    """
    try:
        from airflow import DAG
        from airflow.operators.python import PythonOperator
    except ImportError as e:  # pragma: no cover - exercised via stub
        raise ImportError(
            "apache-airflow is not installed; use "
            "big_data_pipeline_spark.scheduler.run_pipeline_with_retries "
            "for the self-contained equivalent"
        ) from e

    cfg = cfg or PipelineConfig(base_dir=base_dir)
    default_args = {
        "retries": retries,
        "retry_delay": _dt.timedelta(seconds=retry_delay_sec),
    }
    kwargs = dict(
        dag_id=dag_id,
        default_args=default_args,
        start_date=start_date or _dt.datetime(2025, 11, 5),
        catchup=catchup,
        description="End-to-end stock data pipeline with ML prediction",
    )
    try:
        # Airflow >= 2.4 spelling (and the only one Airflow 3 accepts).
        dag = DAG(schedule=schedule, **kwargs)
    except TypeError:
        # Airflow 2.0-2.3 (the reference's dags/stock_pipeline_dag.py
        # era) only knows schedule_interval= — keep the factory drop-in
        # across the 2.x line instead of TypeError-ing on older installs.
        dag = DAG(schedule_interval=schedule, **kwargs)
    with dag:
        tasks = [
            PythonOperator(
                task_id=f"{stage}_data" if stage != "predict"
                else "predict_future",
                python_callable=_stage_callable(stage, cfg, spark_factory),
            )
            for stage in _STAGES
        ]
        for up, down in zip(tasks, tasks[1:]):
            up >> down
    return dag
