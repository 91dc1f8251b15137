"""G2: schedule/retry semantics for the pipeline DAG.

The reference delegates orchestration to Airflow
(``dags/stock_pipeline_dag.py:14-27``: ``schedule_interval="@daily"``,
``retries=1``, ``retry_delay=timedelta(minutes=5)``, and the linear
dependency chain at ``:29-50``). SURVEY.md §2.11 keeps the scheduler
itself out of engine scope, but the *retry contract* is engine-visible:
every stage must be idempotently re-runnable (all sinks are
``mode=overwrite`` — S12 truncate-then-load), and a failed stage must be
retryable without re-running its green predecessors.

This module is the minimal in-process shim an external scheduler (cron,
Airflow, Dagster) would call per stage — or that ``run_pipeline_with_
retries`` drives end-to-end. It deliberately has no clock loop: at
cluster scale the *scheduler* owns the calendar; the engine owns
idempotence and stage boundaries.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Sequence
from dataclasses import dataclass, field

from pyspark.sql import SparkSession


@dataclass
class StageRun:
    """One stage's execution record (what Airflow calls a task instance)."""

    name: str
    attempts: int
    succeeded: bool
    error: str | None = None
    elapsed_sec: float = 0.0


@dataclass
class RetryPolicy:
    """``retries``/``retry_delay`` with the reference's defaults
    (``stock_pipeline_dag.py:17-18``: retries=1, delay=5min — delay
    shrunk for tests via the argument)."""

    retries: int = 1
    retry_delay_sec: float = 300.0


@dataclass
class DagReport:
    runs: list[StageRun] = field(default_factory=list)

    @property
    def succeeded(self) -> bool:
        return all(r.succeeded for r in self.runs)


def run_stage_with_retries(
    name: str,
    fn: Callable[[], object],
    policy: RetryPolicy,
    sleep: Callable[[float], None] = time.sleep,
) -> StageRun:
    """Run one stage, retrying up to ``policy.retries`` times.

    Safe because every stage sink overwrites its whole layer (S12): a
    partially-written attempt is fully replaced by the retry, never
    appended to.
    """
    attempts = 0
    while True:
        attempts += 1
        t0 = time.perf_counter()
        try:
            fn()
            return StageRun(name, attempts, True, None, time.perf_counter() - t0)
        except Exception as e:  # noqa: BLE001 — scheduler boundary
            if attempts > policy.retries:
                return StageRun(
                    name, attempts, False, repr(e), time.perf_counter() - t0
                )
            sleep(policy.retry_delay_sec)


def run_dag(
    stages: Sequence[tuple[str, Callable[[], object]]],
    policy: RetryPolicy | None = None,
    sleep: Callable[[float], None] = time.sleep,
) -> DagReport:
    """Linear DAG driver: ``a >> b >> c`` with per-stage retry.

    Mirrors the reference chain ``ingest >> transform >> combine >>
    predict`` (``stock_pipeline_dag.py:50``): a stage runs only after
    its predecessor succeeded; a stage that exhausts its retries stops
    the DAG (downstream stages are not attempted, matching Airflow's
    upstream-failed semantics).
    """
    policy = policy or RetryPolicy()
    report = DagReport()
    for name, fn in stages:
        run = run_stage_with_retries(name, fn, policy, sleep=sleep)
        report.runs.append(run)
        if not run.succeeded:
            break
    return report


def run_pipeline_with_retries(
    spark: SparkSession,
    cfg,
    policy: RetryPolicy | None = None,
    sleep: Callable[[float], None] = time.sleep,
) -> DagReport:
    """``run_pipeline`` under the retry contract — the shim an external
    scheduler's ``@daily`` tick would invoke."""
    from big_data_pipeline_spark import pipeline as p

    stages = [
        ("ingest", lambda: p.ingest(spark, cfg)),
        ("transform", lambda: p.transform(spark, cfg)),
        ("combine", lambda: p.combine(spark, cfg)),
        ("predict", lambda: p.predict(spark, cfg)),
    ]
    return run_dag(stages, policy, sleep=sleep)
