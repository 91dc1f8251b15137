"""Change-data-capture by snapshot diff: derive an I/U/D feed.

The complement of MERGE/SCD (`io.merge_upsert`, `operators/scd.py`):
those APPLY a change feed; this DERIVES one from two table snapshots —
the standard bootstrap when the upstream system offers no log-based
CDC. One full-outer join on the key:

- key only in ``after``            → I (insert)
- key only in ``before``           → D (delete)
- both, any compared column differs → U (update; null-safe compare, so
  NULL→value and value→NULL count as changes)
- both, all equal                   → dropped (no-op rows never enter
  the feed — at 100 TB the feed is |changes|, not |table|)

Scale shape: one co-keyed shuffle join of the two snapshots. With
snapshots laid out by the same bucketing/partitioning (io.write_bucketed)
the exchange disappears entirely; AQE handles skewed keys otherwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    before: DataFrame,
    after: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """I/U/D rows between two snapshots.

    Output: ``op`` ('I'/'U'/'D'), the key columns (coalesced across
    sides), and ``<col>_before`` / ``<col>_after`` for every compared
    column. ``compare_cols`` defaults to the non-key columns the two
    snapshots share.
    """
    if compare_cols is None:
        compare_cols = sorted(
            (set(before.columns) & set(after.columns)) - set(keys)
        )
    # presence markers, not key-nullity: a NULL join key never matches in
    # SQL, and its row must still classify by which SIDE it came from
    b = before.select(
        *[F.col(k).alias(f"_b_{k}") for k in keys],
        *[F.col(c).alias(f"{c}_before") for c in compare_cols],
        F.lit(True).alias("_b_present"),
    )
    a = after.select(
        *[F.col(k).alias(f"_a_{k}") for k in keys],
        *[F.col(c).alias(f"{c}_after") for c in compare_cols],
        F.lit(True).alias("_a_present"),
    )
    cond = None
    for k in keys:
        eq = F.col(f"_a_{k}") == F.col(f"_b_{k}")
        cond = eq if cond is None else (cond & eq)
    joined = a.join(b, cond, "full_outer")

    in_after = F.coalesce(F.col("_a_present"), F.lit(False))
    in_before = F.coalesce(F.col("_b_present"), F.lit(False))
    changed = F.lit(False)
    for c in compare_cols:
        changed = changed | ~F.col(f"{c}_after").eqNullSafe(
            F.col(f"{c}_before")
        )
    op = (
        F.when(~in_before, F.lit("I"))
        .when(~in_after, F.lit("D"))
        .otherwise(F.lit("U"))
    )
    return (
        joined.withColumn("op", op)
        .filter(~in_before | ~in_after | changed)
        .select(
            "op",
            *[
                F.coalesce(F.col(f"_a_{k}"), F.col(f"_b_{k}")).alias(k)
                for k in keys
            ],
            *[
                col
                for c in compare_cols
                for col in (f"{c}_before", f"{c}_after")
            ],
        )
    )
