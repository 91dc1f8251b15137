"""The reference-parity flagship path as a registered query.

Runs the full 4-stage pipeline (ingest → transform → combine → predict,
SURVEY.md §7.2) on deterministic synthetic bars in a temp lake and
returns the predictions frame. No SQL oracle — multi-feature OLS via
``applyInPandas`` is not SQL-expressible — so the driver applies its
rows-only check (3 symbols → 3 rows); the numeric golden check lives in
``tests/test_linreg.py`` / ``tests/test_pipeline.py``.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession

from big_data_pipeline_spark.pipeline import PipelineConfig, run_pipeline


def stock_pipeline_predict(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = tempfile.mkdtemp(prefix="stock_lake_")
    # 60 hourly bars x 3 symbols: enough rows to exercise every stage
    # (well past the <2-row guard) while keeping the bench entry cheap —
    # the flagship's cost is layer materialization, not data volume.
    cfg = PipelineConfig(base_dir=base, periods=60)
    return run_pipeline(spark, cfg)


QUERIES = {"stock_pipeline_predict": stock_pipeline_predict}
ORACLE: dict[str, str] = {}
