"""Skew mitigation: deterministic salting for hot keys.

AQE's skew-join handling (on in session.py) covers most cases at
runtime by splitting oversized partitions. Salting is the *plan-level*
tool for the cases AQE can't fix — a single group-by key holding a
double-digit percent of all rows, or a join where one hot key floods
one task. Both helpers keep results bit-identical to the unsalted
plan, so they are oracle-checked like any other query.

- ``salted_aggregate``: two-phase aggregation. Phase 1 groups on
  (keys, salt) — the hot key's rows spread over ``n_salts`` reducers —
  phase 2 merges the partials on the real keys. Only algebraic
  aggregates (sum/count/min/max) are offered; they re-aggregate
  losslessly.
- ``salted_join``: explode the small side into ``n_salts`` copies, salt
  the big side deterministically (hash of the row's other columns, NOT
  rand() — keeps retries/oracles reproducible), equi-join on
  (key, salt). The small side grows n_salts-fold; the hot key's
  big-side rows land on n_salts different reducers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"

_MERGE = {
    "sum": F.sum,
    "count": F.sum,  # counts re-aggregate by summing partials
    "min": F.min,
    "max": F.max,
}
_PARTIAL = {
    "sum": F.sum,
    # count('*') counts rows; count(col) must skip nulls exactly like
    # the unsalted plan (bit-identical promise of this module)
    "count": lambda c: F.count(F.lit(1)) if c == "*" else F.count(F.col(c)),
    "min": F.min,
    "max": F.max,
}


def _det_salt(df: DataFrame, keys: list[str], n_salts: int) -> Column:
    """Deterministic per-row salt from the non-key columns (falls back
    to the key itself for key-only frames — then salting is a no-op)."""
    others = [c for c in df.columns if c not in keys] or keys
    return F.pmod(F.xxhash64(*[F.col(c) for c in others]), F.lit(n_salts))


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` maps output column -> (kind, input column) with kind in
    {sum, count, min, max}. Example::

        salted_aggregate(lineitem, ["l_returnflag"],
                         {"n": ("count", "*"), "qty": ("sum", "l_quantity")})
    """
    unknown = {k for k, (kind, _) in aggs.items() if kind not in _PARTIAL}
    if unknown:
        raise ValueError(f"non-algebraic aggregates: {unknown}")

    salted = df.withColumn(_SALT, _det_salt(df, keys, n_salts))
    partial = salted.groupBy(*keys, _SALT).agg(
        *[
            _PARTIAL[kind](col).alias(out)
            for out, (kind, col) in aggs.items()
        ]
    )
    return partial.groupBy(*keys).agg(
        *[_MERGE[kind](out).alias(out) for out, (kind, _) in aggs.items()]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    n_salts: int = 8,
) -> DataFrame:
    """Skew-safe inner equi-join (big x small). Output columns =
    big's then small's non-key columns, like ``big.join(small, on)``."""
    salted_big = big.withColumn(_SALT, _det_salt(big, on, n_salts))
    exploded_small = small.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return salted_big.join(exploded_small, [*on, _SALT]).drop(_SALT)
