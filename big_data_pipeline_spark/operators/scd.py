"""Slowly-changing-dimension type 2: keyed history with validity ranges.

The reference keeps only latest-state data (truncate-and-reload, S12);
a warehouse-grade pipeline also needs the other standard freshness
semantic — full change history. SCD-2 rows carry
(valid_from, valid_to, is_current): applying a batch of updates closes
the current row of every key whose tracked attributes changed and
opens a new one effective at the batch timestamp.

Scale shape: one join of updates against CURRENT rows only (the open
slice, typically ≪ history), one anti-join to carry unchanged history
through, and a partition-friendly rewrite. No per-row driver logic;
ties within a batch resolve deterministically (last update per key by
the caller's ordering column wins via a window rank).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

SCD2_COLS = ("valid_from", "valid_to", "is_current")


def scd2_init(df: DataFrame, effective: str) -> DataFrame:
    """Bootstrap a dimension frame into SCD-2 shape (all rows open)."""
    return (
        df.withColumn("valid_from", F.col(effective).cast("timestamp"))
        .withColumn("valid_to", F.lit(None).cast("timestamp"))
        .withColumn("is_current", F.lit(True))
    )


def scd2_apply(
    history: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    tracked_cols: list[str],
    effective: str,
) -> DataFrame:
    """Return the new history frame after applying ``updates``.

    ``updates`` carries key + tracked columns + an ``effective``
    timestamp column. Keys with unchanged tracked values are no-ops;
    changed/new keys close the open row (valid_to = effective) and
    insert a fresh open row. ``updates`` must carry every attribute
    column of the dimension (key + tracked + ``effective``). Pure
    transformation — callers persist via io.write_parquet /
    io.merge_upsert so the write strategy stays theirs.
    """
    # last update per key wins within a batch (deterministic tie-break)
    w = Window.partitionBy(*key_cols).orderBy(F.desc(effective))
    up = (
        updates.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    current = history.filter(F.col("is_current"))
    older = history.filter(~F.col("is_current"))

    cur_k = current.select(
        *key_cols,
        *[F.col(c).alias(f"_cur_{c}") for c in tracked_cols],
        F.lit(True).alias("_cur_exists"),
    )
    joined = up.join(cur_k, key_cols, "left")
    # a key is "changed" when it has no current row at all, or any
    # tracked attribute differs (null-safe, so NULL→value and
    # value→NULL count). The explicit existence flag matters: an
    # all-NULL update for a NEW key would otherwise satisfy
    # NULL <=> NULL against the unmatched join and be dropped silently.
    same = F.expr(" AND ".join(f"({c} <=> _cur_{c})" for c in tracked_cols))
    is_new = F.col("_cur_exists").isNull()
    changed = joined.filter(is_new | ~same).select(up["*"])

    ch_keys = changed.select(*key_cols, F.col(effective).alias("_eff"))
    closed = (
        current.join(ch_keys, key_cols, "inner")
        .withColumn("valid_to", F.col("_eff").cast("timestamp"))
        .withColumn("is_current", F.lit(False))
        .drop("_eff")
    )
    untouched_current = current.join(ch_keys, key_cols, "left_anti")
    opened = scd2_init(changed, effective).select(*closed.columns)
    return older.unionByName(untouched_current).unionByName(closed).unionByName(
        opened
    )
