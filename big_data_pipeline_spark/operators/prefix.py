"""Distributed prefix (running) sums: the scale-out form of the
cumulative window.

``SUM(...) OVER (PARTITION BY p ORDER BY o ROWS UNBOUNDED PRECEDING)``
executes each window partition in ONE task — fine when the partition
key is high-cardinality (per-user running sums), a single-task
bottleneck when it is low-cardinality (a per-language token stream at
100 TB: 5 languages → 5 tasks hold the whole corpus).

``sharded_running_sum`` is the classic two-phase prefix-sum fix:

1. split each window partition into ``shards`` contiguous ranges of the
   order column (boundaries from ``approxQuantile`` — one bounded
   driver-side collect of ``shards-1`` doubles),
2. local running sum within (partition, shard) — all shards in
   parallel,
3. per-shard totals (tiny: |parts|×|shards| rows), running-summed into
   per-shard OFFSETS by an equally tiny window, broadcast-joined back,
4. global running sum = local sum + shard offset.

The result is bit-identical to the single-task window for exact types
(integers / decimals); for doubles the summation order changes, which
is the usual floating-point caveat. Cost: one extra tiny aggregation
and a broadcast join, no extra shuffle of the data (the local window's
shuffle replaces the global window's).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def shard_bounds(
    df: DataFrame, order_cols: list[str], shards: int = 32
) -> list[list[float]]:
    """Shard boundaries for several order columns in ONE approxQuantile
    pass (identical per-column results to separate calls — the sketch is
    built per column either way). Callers that rank the same frame by
    multiple metrics (e.g. R/F/M) otherwise pay one full boundary-probe
    job per metric."""
    return df.approxQuantile(
        order_cols, [i / shards for i in range(1, shards)], 0.001
    )


def sharded_running_sums(
    df: DataFrame,
    part_cols: list[str],
    order_col: str,
    values: list[tuple[str | Column, str]],
    shards: int = 32,
    tiebreak_cols: list[str] | None = None,
    bounds: list[float] | None = None,
) -> DataFrame:
    """Append one running-sum column per ``(value_col, out_col)`` pair,
    all over the SAME total order, in ONE pass — one approxQuantile,
    one local window, one tiny offsets aggregate, one broadcast join,
    however many cumulative columns ride along. Consumers that need
    both a running total and a running rank (pareto, quantile splits)
    would otherwise pay the whole two-phase lineage twice.

    ``(order_col, *tiebreak_cols)`` must be unique within a partition
    (it is the total order; ties would make any running sum
    ill-defined). Shard boundaries come from ``order_col`` alone; rows
    tied on a boundary value fall in one shard, where the tiebreak
    orders them.
    """
    vals = [
        (F.col(v) if isinstance(v, str) else v, out) for v, out in values
    ]
    if bounds is None:
        bounds = (
            shard_bounds(df, [order_col], shards)[0] if shards > 1 else []
        )
    # shard id = number of boundaries strictly below the order value;
    # duplicate boundaries just leave some shards empty (harmless).
    # NULL order values make every comparison NULL — coalesce them into
    # shard 0, matching the window's ascending NULLS FIRST placement
    # (otherwise the offsets equi-join would silently drop those rows).
    shard: Column = F.coalesce(
        reduce(
            lambda a, b: a + b,
            [(F.col(order_col) > F.lit(q)).cast("int") for q in bounds],
            F.lit(0),
        ),
        F.lit(0),
    )
    order = [order_col, *(tiebreak_cols or [])]
    local_w = (
        Window.partitionBy(*part_cols, "__shard")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = df.withColumn("__shard", shard)
    for i, (value, _) in enumerate(vals):
        local = local.withColumn(f"__local{i}", F.sum(value).over(local_w))
    off_w = (
        Window.partitionBy(*part_cols)
        .orderBy("__shard")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = local.groupBy(*part_cols, "__shard").agg(
        *[F.sum(value).alias(f"__tot{i}") for i, (value, _) in enumerate(vals)]
    )
    for i in range(len(vals)):
        offsets = offsets.withColumn(
            f"__off{i}",
            F.coalesce(F.sum(f"__tot{i}").over(off_w), F.lit(0)),
        )
    offsets = offsets.select(
        *part_cols, "__shard", *[f"__off{i}" for i in range(len(vals))]
    )
    out = local.join(F.broadcast(offsets), [*part_cols, "__shard"])
    drop = ["__shard"]
    for i, (_, out_col) in enumerate(vals):
        out = out.withColumn(
            out_col, F.col(f"__local{i}") + F.col(f"__off{i}")
        )
        drop += [f"__local{i}", f"__off{i}"]
    return out.drop(*drop)


def sharded_running_sum(
    df: DataFrame,
    part_cols: list[str],
    order_col: str,
    value_col: str | Column,
    out_col: str,
    shards: int = 32,
    tiebreak_cols: list[str] | None = None,
    bounds: list[float] | None = None,
) -> DataFrame:
    """Single-column form of :func:`sharded_running_sums`."""
    return sharded_running_sums(
        df,
        part_cols,
        order_col,
        [(value_col, out_col)],
        shards=shards,
        tiebreak_cols=tiebreak_cols,
        bounds=bounds,
    )


def sharded_running_max(
    df: DataFrame,
    part_cols: list[str],
    order_col: str,
    value_col: str | Column,
    out_col: str,
    shards: int = 32,
    tiebreak_cols: list[str] | None = None,
    inclusive: bool = True,
) -> DataFrame:
    """Running MAX twin of ``sharded_running_sum`` — same two-phase
    shard decomposition, with ``greatest`` as the combine. Unlike the
    sum, max is exact for doubles in any order, so there is no
    floating-point caveat at all.

    ``inclusive=False`` gives the max over STRICT predecessors (the
    ``ROWS UNBOUNDED PRECEDING AND 1 PRECEDING`` frame) — ``out_col``
    is NULL for the global first row, exactly like the window form.
    That frame is what dominance tests (skyline) and "new high
    watermark" detectors need, and it cannot be derived from the
    inclusive result after the fact.
    """
    value = F.col(value_col) if isinstance(value_col, str) else value_col
    bounds = (
        df.approxQuantile(
            order_col, [i / shards for i in range(1, shards)], 0.001
        )
        if shards > 1
        else []
    )
    shard: Column = F.coalesce(
        reduce(
            lambda a, b: a + b,
            [(F.col(order_col) > F.lit(q)).cast("int") for q in bounds],
            F.lit(0),
        ),
        F.lit(0),
    )
    order = [order_col, *(tiebreak_cols or [])]
    end = Window.currentRow if inclusive else -1
    local_w = (
        Window.partitionBy(*part_cols, "__shard")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, end)
    )
    local = df.withColumn("__shard", shard).withColumn(
        "__local", F.max(value).over(local_w)
    )
    off_w = (
        Window.partitionBy(*part_cols)
        .orderBy("__shard")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        local.groupBy(*part_cols, "__shard")
        .agg(F.max(value).alias("__tot"))
        .withColumn("__off", F.max("__tot").over(off_w))
        .select(*part_cols, "__shard", "__off")
    )
    # greatest() ignores NULLs (first row of first shard / shard 0
    # offset), matching the window's NULL-for-empty-frame result only
    # when both sides are NULL.
    return (
        local.join(F.broadcast(offsets), [*part_cols, "__shard"])
        .withColumn(out_col, F.greatest(F.col("__local"), F.col("__off")))
        .drop("__shard", "__local", "__off")
    )
