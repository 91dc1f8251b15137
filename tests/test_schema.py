"""Unit tests for the fuzzy schema resolver (SURVEY.md §1.3)."""

from __future__ import annotations

from big_data_pipeline_spark.schema import (
    CANONICAL_COLUMNS,
    find_datetime_column,
    normalize_schema,
)


def test_find_datetime_column_prefers_datetime_over_date():
    assert find_datetime_column(["trade_date", "Datetime_x", "foo"]) == "Datetime_x"
    assert find_datetime_column(["last_date", "foo"]) == "last_date"
    assert find_datetime_column(["a", "b"]) is None


def test_normalize_strips_symbol_suffixes(spark):
    # MultiIndex-flattened yfinance columns: Close_AAPL etc.
    df = spark.createDataFrame(
        [("2024-01-02 10:00:00-05:00", 1.0, 2.0, 0.5, 1.5, 100)],
        ["Datetime", "Open_AAPL", "High_AAPL", "Low_AAPL", "Close_AAPL", "Volume_AAPL"],
    )
    out = normalize_schema(df, symbol="AAPL")
    assert out.columns == list(CANONICAL_COLUMNS)
    row = out.first()
    assert row["Close"] == 1.5
    assert row["Volume"] == 100
    assert row["symbol"] == "AAPL"
    # Offset-aware string parsed, not nulled (divergence from reference
    # documented in SURVEY.md §0): 10:00-05:00 == 15:00 UTC.
    assert row["Datetime"] is not None
    assert row["Datetime"].hour == 15


def test_normalize_keeps_existing_symbol_column(spark):
    df = spark.createDataFrame(
        [("2024-01-02 10:00:00", 1.5, "MSFT")], ["Datetime", "Close", "symbol"]
    )
    out = normalize_schema(df, symbol="IGNORED")
    assert out.first()["symbol"] == "MSFT"


def test_normalize_projects_only_existing_columns(spark):
    df = spark.createDataFrame([("2024-01-02 10:00:00", 1.5)], ["Datetime", "Close"])
    out = normalize_schema(df)
    assert out.columns == ["Datetime", "Close"]


def test_normalize_last_match_wins(spark):
    # transform.py:53-55 dict overwrite: later column wins the rename.
    df = spark.createDataFrame(
        [("2024-01-02 10:00:00", 1.0, 2.0)], ["Datetime", "close_old", "Adj_Close"]
    )
    out = normalize_schema(df)
    assert out.first()["Close"] == 2.0
