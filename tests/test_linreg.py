"""Golden tests for the grouped next-close predictor (SURVEY.md §7.4:
grouped-map determinism is on the watch list — test it explicitly)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from big_data_pipeline_spark.ml.linreg import predict_next_close, train_predict_group


def _bars(symbol: str, n: int, seed: int) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    close = 100 + np.cumsum(rng.normal(0, 1, n))
    return pd.DataFrame(
        {
            "Datetime": pd.date_range("2024-01-01", periods=n, freq="h"),
            "Open": close + rng.normal(0, 0.1, n),
            "High": close + 1,
            "Low": close - 1,
            "Close": close,
            "Volume": rng.integers(100, 1000, n).astype("int64"),
            "symbol": symbol,
        }
    )


def _expected(pdf: pd.DataFrame) -> tuple[float, float]:
    """Reference semantics re-implemented independently with numpy."""
    g = pdf.sort_values("Datetime")
    feats = ["Open", "High", "Low", "Close", "Volume"]
    y = g["Close"].shift(-1)
    train = g.assign(target=y).dropna(subset=[*feats, "target"])
    x = np.column_stack([np.ones(len(train)), train[feats].to_numpy(float)])
    coef, *_ = np.linalg.lstsq(x, train["target"].to_numpy(float), rcond=None)
    mse = float(np.mean((x @ coef - train["target"].to_numpy(float)) ** 2))
    last = g.iloc[-1]
    pred = float(np.concatenate([[1.0], last[feats].to_numpy(float)]) @ coef)
    return round(pred, 2), round(mse, 4)


def test_grouped_map_matches_numpy_golden():
    pdf = _bars("AAPL", 50, seed=7)
    out = train_predict_group(pdf.sample(frac=1.0, random_state=3))  # shuffled input
    pred, mse = _expected(pdf)
    assert out["symbol"].iloc[0] == "AAPL"
    assert out["predicted_close"].iloc[0] == pred
    assert out["mse"].iloc[0] == mse


def test_small_group_guard_returns_empty():
    pdf = _bars("TINY", 2, seed=1)  # shift(-1) leaves 1 training row → guard
    assert len(train_predict_group(pdf)) == 0


def test_spark_end_to_end_per_symbol(spark):
    pdf = pd.concat([_bars("AAPL", 40, 1), _bars("MSFT", 40, 2)], ignore_index=True)
    out = predict_next_close(spark.createDataFrame(pdf)).toPandas()
    assert sorted(out["symbol"]) == ["AAPL", "MSFT"]
    for sym in ("AAPL", "MSFT"):
        pred, mse = _expected(pdf[pdf["symbol"] == sym])
        row = out[out["symbol"] == sym].iloc[0]
        assert row["predicted_close"] == pred
        assert row["mse"] == mse


def test_flagship_exact_rational_oracle_matches_float_solver():
    """The VALUES oracle for stock_pipeline_predict is derived from an
    exact-rational normal-equation solve; the production path is numpy
    lstsq. Both must land on the same reference-rounded cells (the
    oracle generator asserts a >=1e-7 boundary margin, so this can only
    fail if a solver is wrong, not from fp noise)."""
    from big_data_pipeline_spark.pipeline import synthetic_bars
    from big_data_pipeline_spark.workloads.pipeline_flagship import (
        _FLAGSHIP_PERIODS,
        _FLAGSHIP_SEED,
        _exact_rational_prediction,
        DEFAULT_SYMBOLS,
    )

    for sym in DEFAULT_SYMBOLS:
        pdf = synthetic_bars(sym, _FLAGSHIP_PERIODS, _FLAGSHIP_SEED)
        feats = [f"{m}_{sym}" for m in ("Open", "High", "Low", "Close", "Volume")]
        x = np.column_stack(
            [np.ones(_FLAGSHIP_PERIODS - 1)]
            + [pdf[c].to_numpy(float)[:-1] for c in feats]
        )
        y = pdf[f"Close_{sym}"].to_numpy(float)[1:]
        coef, *_ = np.linalg.lstsq(x, y, rcond=None)
        mse = float(np.mean((x @ coef - y) ** 2))
        pred = float(
            np.concatenate([[1.0], pdf[feats].to_numpy(float)[-1]]) @ coef
        )
        got_sym, got_pred, _, got_mse = _exact_rational_prediction(
            sym, _FLAGSHIP_PERIODS, _FLAGSHIP_SEED
        )
        assert got_sym == sym
        assert got_pred == round(pred, 2)
        assert got_mse == round(mse, 4)
