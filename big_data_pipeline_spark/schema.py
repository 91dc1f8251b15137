"""Canonical OHLCV schema + the fuzzy schema resolver.

Re-expresses the reference's most distinctive semantic (SURVEY.md §1.3):
schemas are never declared — every stage discovers columns at runtime by
case-insensitive substring matching. Driver-side Python over
``df.columns`` only; the data path stays declarative.

Reference behavior being reproduced (citations into /root/reference):
- find the datetime column by substring:   scripts/transform.py:44
- strip per-symbol suffixes (Close_AAPL):  scripts/transform.py:50-56
  (last match wins when several columns contain the metric name)
- add ``symbol`` only if absent:           scripts/transform.py:59-60
- project to canonical columns that exist: scripts/transform.py:62-64
- lowercase + fuzzy feature discovery:     scripts/stock_predictor.py:42-64

Divergence (documented in SURVEY.md §0): the reference parses
timestamps with a tz-naive pattern and silently nulls tz-offset strings
(transform.py:47 vs stock_ingestor.py:33-35). We parse offset-aware
first and fall back, keeping real data instead of nulls.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

METRICS = ("Open", "High", "Low", "Close", "Volume")
CANONICAL_COLUMNS = ("Datetime", *METRICS, "symbol")

CANONICAL_SCHEMA = T.StructType(
    [
        T.StructField("Datetime", T.TimestampType()),
        T.StructField("Open", T.DoubleType()),
        T.StructField("High", T.DoubleType()),
        T.StructField("Low", T.DoubleType()),
        T.StructField("Close", T.DoubleType()),
        T.StructField("Volume", T.LongType()),
        T.StructField("symbol", T.StringType()),
    ]
)

PREDICTION_SCHEMA = T.StructType(
    [
        T.StructField("symbol", T.StringType()),
        T.StructField("predicted_close", T.DoubleType()),
        T.StructField("last_date", T.StringType()),
        T.StructField("mse", T.DoubleType()),
    ]
)


def find_datetime_column(columns: list[str]) -> str | None:
    """First column containing 'datetime', else first containing 'date'
    (transform.py:44 uses only 'datetime'; predictor.py:44 uses 'date')."""
    for c in columns:
        if "datetime" in c.lower():
            return c
    for c in columns:
        if "date" in c.lower():
            return c
    return None


def _parse_timestamp(col: Column) -> Column:
    """Offset-aware first (`2025-11-05 09:30:00-05:00`), then naive.
    ``try_to_timestamp`` nulls on failure (Spark 4 is ANSI by default, so
    plain ``to_timestamp`` would throw), matching Polars strict=False."""
    return F.coalesce(
        F.try_to_timestamp(col, F.lit("yyyy-MM-dd HH:mm:ssXXX")),
        F.try_to_timestamp(col, F.lit("yyyy-MM-dd HH:mm:ss")),
        col.try_cast("timestamp"),
    )


def normalize_schema(df: DataFrame, symbol: str | None = None) -> DataFrame:
    """Fuzzy-resolve a raw ingest frame to the canonical OHLCV schema.

    Pure column-metadata logic on the driver; emits a single select —
    one narrow projection in the plan, no shuffle.
    """
    cols = list(df.columns)
    dtypes = dict(df.dtypes)
    exprs: list[Column] = []

    dt_col = find_datetime_column(cols)
    if dt_col is not None:
        c = F.col(dt_col)
        if dtypes[dt_col] == "string":
            c = _parse_timestamp(c)
        else:
            c = c.cast("timestamp")
        exprs.append(c.alias("Datetime"))

    # Last match wins, as in transform.py:53-55's dict overwrite.
    for metric in METRICS:
        match = None
        for c in cols:
            if metric.lower() in c.lower():
                match = c
        if match is not None:
            target = "long" if metric == "Volume" else "double"
            exprs.append(F.col(match).cast(target).alias(metric))

    symbol_col = None
    for c in cols:
        if c.lower() == "symbol":
            symbol_col = c
    if symbol_col is not None:
        exprs.append(F.col(symbol_col).cast("string").alias("symbol"))
    elif symbol is not None:
        exprs.append(F.lit(symbol).alias("symbol"))

    return df.select(*exprs)
