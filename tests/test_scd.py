"""SCD-2 history semantics across successive applies."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from big_data_pipeline_spark.operators.scd import scd2_apply, scd2_init


def _dim(spark, rows):
    return spark.createDataFrame(rows, "cust long, tier string, eff timestamp")


def test_scd2_change_new_and_noop(spark):
    t0, t1 = datetime(2024, 1, 1), datetime(2024, 2, 1)
    hist = scd2_init(_dim(spark, [(1, "gold", t0), (2, "silver", t0)]), "eff")
    updates = _dim(
        spark,
        [
            (1, "platinum", t1),  # change -> close + open
            (2, "silver", t1),    # no-op
            (3, "bronze", t1),    # new key -> open
        ],
    )
    out = scd2_apply(hist, updates, ["cust"], ["tier"], "eff")
    rows = {(r.cust, r.tier, r.is_current): r for r in out.collect()}
    assert len(rows) == 4  # closed gold + open platinum + silver + bronze
    closed = rows[(1, "gold", False)]
    assert closed.valid_to == t1
    assert rows[(1, "platinum", True)].valid_from == t1
    assert rows[(2, "silver", True)].valid_to is None  # untouched
    assert rows[(3, "bronze", True)].valid_from == t1


def test_scd2_last_update_per_key_wins_and_history_accumulates(spark):
    t0, t1, t2 = datetime(2024, 1, 1), datetime(2024, 2, 1), datetime(2024, 3, 1)
    hist = scd2_init(_dim(spark, [(1, "gold", t0)]), "eff")
    # two updates for the same key in one batch: later eff wins
    hist = scd2_apply(
        hist, _dim(spark, [(1, "silver", t1), (1, "platinum", t2)]),
        ["cust"], ["tier"], "eff",
    )
    cur = hist.filter(F.col("is_current")).collect()
    assert [(r.cust, r.tier) for r in cur] == [(1, "platinum")]
    # second apply: change again; history now has 3 rows for the key
    hist = scd2_apply(
        hist, _dim(spark, [(1, "gold", datetime(2024, 4, 1))]),
        ["cust"], ["tier"], "eff",
    )
    per_key = hist.filter(F.col("cust") == 1).orderBy("valid_from").collect()
    assert len(per_key) == 3
    assert [r.is_current for r in per_key] == [False, False, True]
    # ranges chain: each closed row's valid_to = next row's valid_from
    assert per_key[0].valid_to == per_key[1].valid_from
    assert per_key[1].valid_to == per_key[2].valid_from


def test_scd2_null_safe_change_detection(spark):
    t0, t1 = datetime(2024, 1, 1), datetime(2024, 2, 1)
    hist = scd2_init(
        spark.createDataFrame([(1, None, t0)], "cust long, tier string, eff timestamp"),
        "eff",
    )
    out = scd2_apply(
        hist, _dim(spark, [(1, "gold", t1)]), ["cust"], ["tier"], "eff"
    )
    assert out.filter(F.col("is_current")).collect()[0].tier == "gold"
    assert out.count() == 2  # NULL -> value detected as a change


def test_scd2_new_key_with_all_null_tracked_attrs_inserts(spark):
    """Regression: a NEW key whose tracked attrs are all NULL must still
    insert (NULL <=> NULL against the unmatched join previously made it
    look unchanged and silently dropped it)."""
    from datetime import datetime

    t0, t1 = datetime(2024, 1, 1), datetime(2024, 2, 1)
    hist = scd2_init(_dim(spark, [(1, "gold", t0)]), "eff")
    out = scd2_apply(
        hist,
        spark.createDataFrame([(2, None, t1)], "cust long, tier string, eff timestamp"),
        ["cust"],
        ["tier"],
        "eff",
    )
    rows = {(r.cust, r.tier, r.is_current) for r in out.collect()}
    assert (2, None, True) in rows
    assert len(rows) == 2
