"""Range (band) join via time-bin bucketing.

Spark evaluates a pure inequality join as a broadcast-nested-loop or a
cartesian product — O(|L|·|R|), hopeless at scale. DuckDB's IEJoin
handles it natively; this operator recovers scalability in Spark by
composition (SURVEY.md custom-operator rule (a)):

    1. bucket both sides into fixed-width time bins,
    2. explode each left row to the bin range its band can touch —
       ceil((upper-lower)/width)+1 bins, a small constant,
    3. shuffle-equi-join on the bin id (plus any equi keys),
    4. re-apply the exact band predicate.

The cartesian blow-up becomes a hash join whose fan-out is bounded by
rows-per-bin; bin width tunes the shuffle-size/filter-selectivity
trade-off exactly like a hypertable chunk interval.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BIN = "__range_bin"


def range_join_binned(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    lower_sec: int,
    upper_sec: int,
    bin_sec: int | None = None,
    extra_on: list[str] | None = None,
) -> DataFrame:
    """Join rows where ``right_ts`` lies in
    ``[left_ts + lower_sec, left_ts + upper_sec)``.

    Returns all left columns + all right columns (names must not
    collide). ``bin_sec`` defaults to the band width.
    """
    if upper_sec <= lower_sec:
        raise ValueError("upper_sec must exceed lower_sec")
    bin_sec = bin_sec or (upper_sec - lower_sec)
    extra_on = extra_on or []

    # Work in microseconds: cast-to-long truncates to seconds and would
    # silently coarsen the band edges for sub-second timestamps.
    bin_us = bin_sec * 1_000_000
    lower_us, upper_us = lower_sec * 1_000_000, upper_sec * 1_000_000

    def to_bin(ts: Column, shift: int = 0) -> Column:
        return F.floor((F.unix_micros(ts) + shift) / bin_us)

    lo, hi = to_bin(F.col(left_ts), lower_us), to_bin(F.col(left_ts), upper_us)
    lhs = left.withColumn(_BIN, F.explode(F.sequence(lo, hi)))
    rhs = right.withColumn(_BIN, to_bin(F.col(right_ts)))

    band = (
        F.unix_micros(F.col(right_ts)) >= F.unix_micros(F.col(left_ts)) + lower_us
    ) & (F.unix_micros(F.col(right_ts)) < F.unix_micros(F.col(left_ts)) + upper_us)
    cond = F.col(f"l.{_BIN}") == F.col(f"r.{_BIN}")
    for k in extra_on:
        cond = cond & (F.col(f"l.{k}") == F.col(f"r.{k}"))

    out_right = [c for c in right.columns if c not in extra_on]
    return (
        lhs.alias("l")
        .join(rhs.alias("r"), cond)
        .filter(band)
        .select(*[f"l.{c}" for c in left.columns], *[f"r.{c}" for c in out_right])
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bin_sec: int,
    extra_on: list[str] | None = None,
) -> DataFrame:
    """Interval × interval overlap join: rows where
    ``[left_start, left_end]`` intersects ``[right_start, right_end]``
    (closed ends, the SQL ``ls <= re AND rs <= le`` semantics).

    Same bucketing idea as ``range_join_binned``, with the standard
    exactly-once refinement: both sides explode to the bins their
    interval touches, the equi-join meets on the shared bin, and the
    residual keeps only the bin CONTAINING the overlap's start
    (``greatest(ls, rs)``) — every overlapping pair matches in exactly
    one bin, so no post-join ``distinct`` (a second full shuffle) is
    needed. Fan-out per row is interval_length/bin_sec + 1; pick
    ``bin_sec`` near the typical interval length.

    Returns all left columns + all right columns (names must not
    collide, except ``extra_on`` equi keys which are taken from left).
    """
    extra_on = extra_on or []
    bin_us = bin_sec * 1_000_000

    # unix_micros rejects TIMESTAMP_NTZ (the parquet date columns);
    # the session runs in UTC, so the ntz→ltz cast is value-preserving
    def _us(col: Column) -> Column:
        return F.unix_micros(col.cast("timestamp"))

    def to_bin(col: str) -> Column:
        return F.floor(_us(F.col(col)) / bin_us)

    lhs = left.withColumn(
        _BIN, F.explode(F.sequence(to_bin(left_start), to_bin(left_end)))
    )
    rhs = right.withColumn(
        _BIN, F.explode(F.sequence(to_bin(right_start), to_bin(right_end)))
    )
    cond = F.col(f"l.{_BIN}") == F.col(f"r.{_BIN}")
    for k in extra_on:
        cond = cond & (F.col(f"l.{k}") == F.col(f"r.{k}"))
    overlap = (
        _us(F.col(f"l.{left_start}")) <= _us(F.col(f"r.{right_end}"))
    ) & (
        _us(F.col(f"r.{right_start}")) <= _us(F.col(f"l.{left_end}"))
    )
    once = F.col(f"l.{_BIN}") == F.floor(
        F.greatest(
            _us(F.col(f"l.{left_start}")),
            _us(F.col(f"r.{right_start}")),
        )
        / bin_us
    )
    out_right = [c for c in right.columns if c not in extra_on]
    return (
        lhs.alias("l")
        .join(rhs.alias("r"), cond)
        .filter(overlap & once)
        .select(*[f"l.{c}" for c in left.columns], *[f"r.{c}" for c in out_right])
    )
