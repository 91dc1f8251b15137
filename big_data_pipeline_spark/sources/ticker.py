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

The fetch backend is pluggable (``option("backend", ...)``):

- ``synthetic`` (default): the deterministic counter-based generator
  (synthetic_bar_range below) — offline, reproducible, and shared with
  the streaming reader, so ``read.format("ticker")`` and an
  ``availableNow`` drain of ``readStream.format("ticker")`` with the
  same options return the SAME rows (tests/test_sources.py pins the
  equality).
- ``http``: GET ``option("endpoint")`` with ``{symbol}``/``{periods}``
  substituted, expecting a JSON array of bar objects — the generic
  stand-in for the reference's market-API fetch
  (``stock_ingestor.py:22``: ``yf.download`` per symbol). Requests are
  rate-limited *per executor process* (S2, ``stock_ingestor.py:23``:
  ``time.sleep(1)`` between fetches) via a process-level throttle:
  ``option("rate_limit_sec", "1.0")``. On a cluster each Python worker
  enforces its own interval, so aggregate request rate scales with
  executor count — cap it by capping fetch-task parallelism
  (``spark.cores.max`` / a dedicated small pool), not with a global
  lock (a driver-coordinated limiter would serialize the cluster).

Emitted rows are in the *ingested* (dirty) shape — suffixed columns are
already flattened to canonical names here since one source serves all
symbols, but timestamps stay offset-aware strings exactly like the
reference's JSON transport (stock_ingestor.py:33-35), so
normalize_schema's parsing path is exercised end-to-end.
"""

from __future__ import annotations

import json
import time
import urllib.request
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

_SCHEMA = (
    "Datetime string, Open double, High double, Low double, "
    "Close double, Volume long, symbol string"
)


class RateLimiter:
    """Minimum-interval throttle (S2). One instance per Python worker
    process (module global below): consecutive ``wait()`` calls are
    spaced ≥ ``interval_sec`` apart, like the reference's
    ``time.sleep(1)`` between symbol downloads — but enforced at the
    *slot* that actually issues requests, so it composes with task
    parallelism instead of serializing the whole job.

    ``clock``/``sleep`` are injectable for deterministic tests.
    """

    def __init__(self, clock=time.monotonic, sleep=time.sleep):
        self._clock = clock
        self._sleep = sleep
        self._next_ok = 0.0

    def wait(self, interval_sec: float) -> float:
        """Block until a request slot is free; return seconds slept."""
        now = self._clock()
        delay = max(0.0, self._next_ok - now)
        if delay > 0:
            self._sleep(delay)
        self._next_ok = max(now, self._next_ok) + interval_sec
        return delay


_PROCESS_LIMITER = RateLimiter()


def _http_fetch_bars(
    endpoint: str,
    symbol: str,
    periods: int,
    rate_limit_sec: float,
    timeout_sec: float = 30.0,
    limiter: RateLimiter | None = None,
) -> list[dict]:
    """One rate-limited GET → list of bar dicts (the generic market-API
    shape: ``[{"Datetime": ..., "Open": ..., ...}, ...]``)."""
    (limiter or _PROCESS_LIMITER).wait(rate_limit_sec)
    url = endpoint.format(symbol=symbol, periods=periods)
    with urllib.request.urlopen(url, timeout=timeout_sec) as resp:  # noqa: S310
        payload = json.loads(resp.read().decode("utf-8"))
    if not isinstance(payload, list):
        raise ValueError(f"ticker endpoint returned non-array JSON for {symbol}")
    return payload


class _SymbolPartition(InputPartition):
    def __init__(self, symbol: str, options: dict):
        self.symbol = symbol
        self.periods = int(options.get("periods", "210"))
        self.seed = int(options.get("seed", "42"))
        self.backend = options.get("backend", "synthetic")
        self.endpoint = options.get("endpoint", "")
        self.rate_limit_sec = float(options.get("rate_limit_sec", "1.0"))


class _TickerReader(DataSourceReader):
    def __init__(self, options: dict):
        raw = options.get("symbols", "AAPL,MSFT,GOOG")
        self.symbols: Sequence[str] = [s for s in raw.split(",") if s]
        self.options = dict(options)
        backend = self.options.get("backend", "synthetic")
        if backend not in ("synthetic", "http"):
            raise ValueError(f"unknown ticker backend: {backend!r}")
        if backend == "http" and not self.options.get("endpoint"):
            raise ValueError("backend=http requires option('endpoint', ...)")

    def partitions(self) -> Sequence[InputPartition]:
        # one partition per symbol = the unit of fetch parallelism
        return [_SymbolPartition(s, self.options) for s in self.symbols]

    def read(self, partition: _SymbolPartition) -> Iterator[tuple]:
        if partition.backend == "http":
            yield from self._read_http(partition)
        else:
            yield from self._read_synthetic(partition)

    @staticmethod
    def _read_synthetic(partition: _SymbolPartition) -> Iterator[tuple]:
        # Same prefix-stable counter-based generator as the streaming
        # reader, so a batch read equals an availableNow drain of the
        # stream with identical options (pinned in tests/test_sources.py).
        pdf = synthetic_bar_range(
            partition.symbol, partition.seed, 0, partition.periods
        )
        if pdf.empty:  # S3 empty-fetch guard (stock_ingestor.py:25-27)
            return
        for row in pdf.itertuples(index=False):
            yield (
                row.Datetime,
                float(row.Open),
                float(row.High),
                float(row.Low),
                float(row.Close),
                int(row.Volume),
                partition.symbol,
            )

    @staticmethod
    def _read_http(partition: _SymbolPartition) -> Iterator[tuple]:
        bars = _http_fetch_bars(
            partition.endpoint,
            partition.symbol,
            partition.periods,
            partition.rate_limit_sec,
        )
        if not bars:  # S3 empty-fetch guard
            return
        for bar in bars:
            yield (
                str(bar["Datetime"]),
                float(bar["Open"]),
                float(bar["High"]),
                float(bar["Low"]),
                float(bar["Close"]),
                int(bar["Volume"]),
                partition.symbol,
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

    def streamReader(self, schema) -> "DataSourceStreamReader":
        return _TickerStreamReader(self.options)


def register_ticker_source(spark) -> None:
    spark.dataSource.register(TickerDataSource)


# --- streaming variant: micro-batch ticker feed (Spark 4 streaming ---------
# Python Data Source). The batch reader above re-pulls a whole rolling
# window per run — the reference's daily truncate-and-reload (S12).
# The streaming reader replaces that with real incremental semantics:
# offsets are bar indices ({"bar": N}), each micro-batch covers
# [start, end) per symbol with one InputPartition per (symbol, range) —
# fetch parallelism and offset bookkeeping both live in the engine, and
# a restart resumes from the checkpointed offset instead of refetching
# history. The synthetic backend makes replays deterministic, so
# exactly-once delivery is testable: an availableNow drain equals the
# batch read of the same bar range (tests/test_sources.py).
#
# Scale: offsets are a single integer regardless of symbol count;
# per-batch work is |symbols| partitions x bars_per_batch rows. A live
# HTTP backend plugs into read() exactly like the batch reader's
# (_http_fetch_bars with the per-worker rate limiter).


_MASK64 = (1 << 64) - 1


def _u01(key: int, idx):
    """Counter-based uniform(0,1): murmur-style 64-bit finalizer over
    (key, bar-index). Bar i's value never depends on how much history
    is generated around it — the prefix-stability a resumable offset
    log requires (numpy's sequential Generators draw in whole-series
    blocks, so their bar i changes when `periods` changes)."""
    import numpy as np

    x = (np.asarray(idx, dtype=np.uint64) * np.uint64(6364136223846793005)
         + np.uint64(key & _MASK64))
    x ^= x >> np.uint64(33)
    x *= np.uint64(0xFF51AFD7ED558CCD)
    x ^= x >> np.uint64(33)
    x *= np.uint64(0xC4CEB9FE1A85EC53)
    x ^= x >> np.uint64(33)
    return (x >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def synthetic_bar_range(symbol: str, seed: int, start: int, end: int):
    """Bars [start, end) of the append-only synthetic feed, prefix-stable
    by construction (see _u01). Close is a random walk, so the cumsum of
    increments [0, end) is computed vectorized and sliced."""
    import zlib

    import numpy as np
    import pandas as pd

    base = zlib.crc32(symbol.encode()) + seed
    idx = np.arange(end, dtype=np.uint64)
    # Box-Muller from two independent uniform streams
    u1 = np.clip(_u01(base * 2 + 1, idx), 1e-12, 1.0)
    u2 = _u01(base * 3 + 7, idx)
    incr = np.sqrt(-2.0 * np.log(u1)) * np.cos(2.0 * np.pi * u2)
    close = 100.0 + np.cumsum(incr)
    sl = slice(start, end)
    i = np.arange(start, end, dtype=np.uint64)
    spread = np.abs(_u01(base * 5 + 3, i)) * 0.5
    opn = close[sl] + (_u01(base * 7 + 9, i) - 0.5) * 0.4
    vol = (1_000 + (_u01(base * 11 + 5, i) * 99_000)).astype(np.int64)
    ts = pd.date_range(
        "2024-01-02 09:30:00", periods=end, freq="h", tz="US/Eastern"
    )[sl]
    return pd.DataFrame(
        {
            "Datetime": [
                t.strftime("%Y-%m-%d %H:%M:%S%z")[:-2] + ":00" for t in ts
            ],
            "Open": opn,
            "High": close[sl] + spread,
            "Low": close[sl] - spread,
            "Close": close[sl],
            "Volume": vol,
        }
    )


class _SymbolRangePartition(InputPartition):
    def __init__(self, symbol: str, start: int, end: int, options: dict):
        self.symbol = symbol
        self.start = start
        self.end = end
        self.periods = int(options.get("periods", "210"))
        self.seed = int(options.get("seed", "42"))


class _TickerStreamReader(DataSourceStreamReader):
    """Bar-index offset log over the deterministic generator."""

    def __init__(self, options: dict):
        raw = options.get("symbols", "AAPL,MSFT,GOOG")
        self.symbols: Sequence[str] = [s for s in raw.split(",") if s]
        self.options = dict(options)
        self.periods = int(options.get("periods", "210"))

    def initialOffset(self) -> dict:
        return {"bar": 0}

    def latestOffset(self) -> dict:
        # the feed's current high-water mark: all bars that exist right
        # now (`periods` grows between runs as history accrues; a live
        # backend would report the API's latest bar index here). Each
        # micro-batch covers [checkpointed offset, this) — per-trigger
        # admission capping would ride the engine's ReadLimit once the
        # Python stream-source API exposes it.
        return {"bar": self.periods}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        if end["bar"] <= start["bar"]:
            return []
        return [
            _SymbolRangePartition(s, start["bar"], end["bar"], self.options)
            for s in self.symbols
        ]

    def read(self, partition: _SymbolRangePartition) -> Iterator[tuple]:
        pdf = synthetic_bar_range(
            partition.symbol, partition.seed, partition.start, partition.end
        )
        if pdf.empty:
            return
        for row in pdf.itertuples(index=False):
            yield (
                row.Datetime,
                float(row.Open),
                float(row.High),
                float(row.Low),
                float(row.Close),
                int(row.Volume),
                partition.symbol,
            )

    def commit(self, end: dict) -> None:
        # offsets below `end` are durable in the checkpoint; the
        # synthetic backend has nothing to clean up
        pass
