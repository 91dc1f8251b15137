"""Per-group next-close linear regression via ``applyInPandas``.

Spark-native re-expression of the reference predictor
(``/root/reference/scripts/stock_predictor.py:38-102``): for each symbol —
fuzzy-discover feature columns, sort by datetime, build a shift(-1)
next-close target, drop incomplete rows, guard groups with < 2 rows,
fit ordinary least squares, predict one step ahead from the latest bar,
and report ``(symbol, predicted_close, last_date, mse)`` with the
reference's rounding (pred → 2 decimals, mse → 4;
stock_predictor.py:92,94).

Design notes:
- ``groupBy(symbol).applyInPandas`` is the canonical Spark pattern for
  per-group sklearn-style training (SURVEY.md §2.10): Arrow-batched,
  one Python worker call per group, parallel across executors. The
  reference's serial ``for symbol in unique(...)`` loop
  (stock_predictor.py:50) becomes cluster-parallel for free.
- The solver is numpy ``lstsq`` (minimum-norm least squares) — same
  normal-equations solution sklearn's LinearRegression computes; no
  sklearn dependency needed.
- Intra-group order is NOT guaranteed by Spark (SURVEY.md §7.4 watch
  list) — the explicit ``sort_values`` inside the function is
  correctness-critical for the shift(-1) target.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from big_data_pipeline_spark.schema import PREDICTION_SCHEMA, find_datetime_column

_METRICS = ("open", "high", "low", "close", "volume")


def _fuzzy_columns(cols: list[str]) -> tuple[str | None, dict[str, str]]:
    """Lowercase fuzzy feature discovery (stock_predictor.py:42-64):
    last column containing each metric name wins."""
    dt = find_datetime_column(cols)
    feats: dict[str, str] = {}
    for m in _METRICS:
        for c in cols:
            if m in c.lower():
                feats[m] = c
    return dt, feats


def train_predict_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """Grouped-map function: one symbol's bars in, one prediction row out."""
    cols = list(pdf.columns)
    sym_col = next((c for c in cols if c.lower() == "symbol"), None)
    symbol = str(pdf[sym_col].iloc[0]) if sym_col is not None else ""
    dt_col, feats = _fuzzy_columns(cols)
    if dt_col is None or "close" not in feats:
        return pd.DataFrame(columns=[f.name for f in PREDICTION_SCHEMA.fields])

    g = pdf.sort_values(dt_col, kind="mergesort")  # stable, like pandas default
    feature_cols = [feats[m] for m in _METRICS if m in feats]
    g = g.assign(_target=g[feats["close"]].shift(-1))
    train = g.dropna(subset=[*feature_cols, "_target"])
    if len(train) < 2:  # small-group guard (stock_predictor.py:75-77)
        return pd.DataFrame(columns=[f.name for f in PREDICTION_SCHEMA.fields])

    x = train[feature_cols].to_numpy(dtype=np.float64)
    y = train["_target"].to_numpy(dtype=np.float64)
    design = np.column_stack([np.ones(len(x)), x])
    coef, *_ = np.linalg.lstsq(design, y, rcond=None)
    fitted = design @ coef
    mse = float(np.mean((y - fitted) ** 2))

    last = g.iloc[-1]
    x_last = np.concatenate(
        [[1.0], last[feature_cols].to_numpy(dtype=np.float64)]
    )
    pred = float(x_last @ coef)
    return pd.DataFrame(
        {
            "symbol": [symbol],
            "predicted_close": [round(pred, 2)],
            "last_date": [str(last[dt_col])],
            "mse": [round(mse, 4)],
        }
    )


def predict_next_close(bars: DataFrame, symbol_col: str = "symbol") -> DataFrame:
    """Train/predict per symbol. One shuffle on the symbol key; Python
    touches only per-group Arrow batches, never the driver."""
    return bars.groupBy(symbol_col).applyInPandas(
        train_predict_group, schema=PREDICTION_SCHEMA
    )
