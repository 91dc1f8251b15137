"""Custom Python Data Source (Spark 4 ``pyspark.sql.datasource`` API)
for OHLCV ticker bars.

The reference ingests bars with a driver-side serial loop over a market
API (S1, reference ``scripts/stock_ingestor.py:10-27``: yf.download per
symbol, 1s sleep, skip-empty). The Spark-native shape is a DataSource
whose ``partitions()`` are the symbols — each executor fetches its
symbols in parallel, the driver never touches row data, and rate limits
apply per task, not per pipeline:

    spark.dataSource.register(TickerDataSource)
    bars = (spark.read.format("ticker")
            .option("symbols", "AAPL,MSFT,GOOG")
            .option("periods", "720").load())

The fetch backend is pluggable: the default is the deterministic
synthetic generator (pipeline.synthetic_bars); a real market-API
backend would implement ``_fetch`` with the HTTP call and inherit the
partitioning/limiting for free. Emitted rows are in the *ingested*
(dirty) shape — suffixed columns are already flattened to canonical
names here since one source serves all symbols, but timestamps stay
offset-aware strings exactly like the reference's JSON transport
(stock_ingestor.py:33-35), so normalize_schema's parsing path is
exercised end-to-end.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

_SCHEMA = (
    "Datetime string, Open double, High double, Low double, "
    "Close double, Volume long, symbol string"
)


class _SymbolPartition(InputPartition):
    def __init__(self, symbol: str, periods: int, seed: int):
        self.symbol = symbol
        self.periods = periods
        self.seed = seed


class _TickerReader(DataSourceReader):
    def __init__(self, options: dict):
        raw = options.get("symbols", "AAPL,MSFT,GOOG")
        self.symbols: Sequence[str] = [s for s in raw.split(",") if s]
        self.periods = int(options.get("periods", "210"))
        self.seed = int(options.get("seed", "42"))

    def partitions(self) -> Sequence[InputPartition]:
        # one partition per symbol = the unit of fetch parallelism
        return [
            _SymbolPartition(s, self.periods, self.seed) for s in self.symbols
        ]

    def read(self, partition: _SymbolPartition) -> Iterator[tuple]:
        # runs on executors; import inside to keep the driver light
        from big_data_pipeline_spark.pipeline import synthetic_bars

        pdf = synthetic_bars(partition.symbol, partition.periods, partition.seed)
        if pdf.empty:  # S3 empty-fetch guard (stock_ingestor.py:25-27)
            return
        sym = partition.symbol
        for row in pdf.itertuples(index=False):
            yield (
                row.Datetime,
                float(getattr(row, f"Open_{sym}")),
                float(getattr(row, f"High_{sym}")),
                float(getattr(row, f"Low_{sym}")),
                float(getattr(row, f"Close_{sym}")),
                int(getattr(row, f"Volume_{sym}")),
                sym,
            )


class TickerDataSource(DataSource):
    """``spark.read.format("ticker")`` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "ticker"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return _TickerReader(self.options)


def register_ticker_source(spark) -> None:
    spark.dataSource.register(TickerDataSource)
