"""big_data_pipeline_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference pipeline ``ziaArzoo/Big-Data-Pipeline`` (a batch OHLCV ETL:
ingest -> transform -> combine -> predict), widened with the operators a
large-scale (100 TB) training-data pipeline needs: deduplication
(exact / MinHash-LSH / SimHash / n-gram Jaccard), embedding similarity
search, multimodal binary columns, text analysis, and a streaming
surface over event tables.

Design stance (see SURVEY.md §7):
- DataFrame/SQL only; Catalyst does the optimizing. No RDDs.
- No driver-side loops over data; per-group logic via windows or
  ``applyInPandas``.
- Every sink idempotent (overwrite / dynamic partition overwrite).
- Python UDFs only where built-ins genuinely can't express the
  semantics, and then always Arrow-batched (pandas_udf / mapInPandas).
"""

__version__ = "0.1.0"

from big_data_pipeline_spark.session import get_spark  # noqa: F401
