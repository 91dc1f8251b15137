"""As-of join: match each left row to the most recent right row at or
before its timestamp, per key.

Spark has no native ASOF JOIN (DuckDB/Pandas do). The naive formulation
— inequality join + greatest-per-group — explodes to O(|L|·|R|) pairs
per key before pruning. This implementation is the linear union trick:

    1. stack both sides into one frame, right rows tagged to sort
       *before* left rows at equal timestamps (inclusive match),
    2. one window per key ordered by (ts, side): ``last(value,
       ignorenulls=True)`` carries the latest right value forward,
    3. keep only left rows.

Cost: ONE shuffle on the key, linear scan per partition — the same
plan shape as a grouped window, so it survives 100 TB (skewed keys are
handled by AQE like any other window shuffle). No driver involvement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side"
_TS = "__asof_ts"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    tolerance=None,
) -> DataFrame:
    """Backward (most-recent-at-or-before) as-of join.

    ``value_cols`` are the right-side columns to attach; they must not
    collide with left column names. ``tolerance`` (a Column interval or
    seconds literal) optionally voids matches older than
    ``left_ts - tolerance``.
    """
    clash = set(value_cols) & set(left.columns)
    if clash:
        raise ValueError(f"value_cols collide with left columns: {clash}")

    passthrough = [c for c in left.columns if c not in on and c != left_ts]
    r = right.select(
        *on,
        F.col(right_ts).alias(_TS),
        F.lit(0).alias(_SIDE),
        *value_cols,
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in passthrough],
    )
    l = left.select(  # noqa: E741
        *on,
        F.col(left_ts).alias(_TS),
        F.lit(1).alias(_SIDE),
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in value_cols],
        *passthrough,
    )
    stacked = r.unionByName(l)

    w = (
        Window.partitionBy(*on)
        .orderBy(_TS, _SIDE)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Carry the whole matched right ROW as one struct (its ts + all
    # value columns), not each value independently: per-column
    # last(ignorenulls) would skip back past a newer right row whose
    # value is NULL — attaching a stale value the tolerance check (keyed
    # to the newest row's ts) would then wrongly admit. Row semantics
    # match native ASOF joins: the most recent right row wins, NULLs and
    # all.
    match = F.last(
        F.when(
            F.col(_SIDE) == 0,
            F.struct(F.col(_TS).alias("__mts"), *value_cols),
        ),
        ignorenulls=True,
    ).over(w)
    carried = stacked.withColumn("__asof_m", match)
    alive = F.col("__asof_m").isNotNull()
    if tolerance is not None:
        alive = alive & (
            F.col("__asof_m.__mts") >= F.col(_TS) - tolerance
        )
    carried = carried.withColumns(
        {
            c: F.when(alive, F.col(f"__asof_m.{c}")).otherwise(F.lit(None))
            for c in value_cols
        }
    ).drop("__asof_m")

    out_cols = [*left.columns, *value_cols]
    return (
        carried.filter(F.col(_SIDE) == 1)
        .withColumnRenamed(_TS, left_ts)
        .select(*out_cols)
    )
