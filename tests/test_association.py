"""Market-basket association semantics (workloads/association.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_pipeline_spark.workloads import association


def _write_baskets(spark, tmp_path, baskets):
    rows = [
        (order, part, i)
        for order, parts in baskets.items()
        for i, part in enumerate(parts)
    ]
    spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long, l_linenumber int"
    ).write.parquet(str(tmp_path / "lineitem.parquet"))


def test_part_affinity_lift_toy_values(spark, tmp_path):
    # parts 1,2 always together (2 of 4 baskets); part 3 ubiquitous.
    _write_baskets(
        spark,
        tmp_path,
        {10: [1, 2, 3], 11: [1, 2, 3], 12: [3, 4], 13: [3, 4, 1]},
    )
    out = {
        (r.part1, r.part2): r
        for r in association.part_affinity_lift(spark, str(tmp_path)).collect()
    }
    r12 = out[(1, 2)]
    # n1=3 baskets contain part1, n2=2 contain part2, pair in 2 of 4
    assert (r12.n_pair, r12.n1, r12.n2) == (2, 3, 2)
    assert r12.support == 2.0 / 4.0
    assert r12.lift == 2.0 * 4.0 / 3.0 / 2.0
    # ubiquitous part 3 has lift <= 1 with its partners
    assert out[(1, 3)].lift <= 1.0 + 1e-12
    # pairs below min support (e.g. 1-4 co-occur once) are dropped
    assert (1, 4) not in out


def test_part_affinity_dedupes_repeated_lines(spark, tmp_path):
    # the same part on two lines of one order is ONE basket membership
    rows = [(10, 1, 0), (10, 1, 1), (10, 2, 2), (11, 1, 0), (11, 2, 1)]
    spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long, l_linenumber int"
    ).write.parquet(str(tmp_path / "lineitem.parquet"))
    out = association.part_affinity_lift(spark, str(tmp_path)).collect()
    assert len(out) == 1
    assert (out[0].n_pair, out[0].n1, out[0].n2) == (2, 2, 2)
    assert out[0].lift == 2.0 * 2.0 / 2.0 / 2.0  # == 1: perfectly dependent n


def test_part_affinity_orders_by_lift_and_caps(spark, sf_dir):
    df = association.part_affinity_lift(spark, sf_dir)
    rows = df.collect()
    assert len(rows) <= association._TOP_K
    lifts = [r.lift for r in rows]
    assert lifts == sorted(lifts, reverse=True)
    assert all(r.n_pair >= association._MIN_PAIR_SUPPORT for r in rows)
