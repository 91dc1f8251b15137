"""Induced-skew coverage: a 100:1 hot key through the salting operators
and through AQE's runtime skew-join split.

The uniform corpus fixtures never stress the skew machinery; these
tests build a deliberately hot key (~99% of all rows) and assert
(a) the salted plans stay bit-identical to their naive twins,
(b) the salt actually SPREADS the hot key over many reducers (the
    reason the operator exists), and
(c) Spark's AQE skew-join split fires on the naive join under
    realistic-at-scale thresholds (scaled down to fixture bytes).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_pipeline_spark.operators.skew import (
    _det_salt,
    salted_aggregate,
    salted_join,
)

HOT = 0
N_BIG = 50_000  # ~99% of rows carry the hot key


@pytest.fixture(scope="module")
def skewed_big(spark):
    # key 0 is hot (99%), keys 1..99 share the remaining 1%
    return (
        spark.range(N_BIG)
        .select(
            F.when(F.col("id") % 100 == 0, (F.col("id") / 100) % 99 + 1)
            .otherwise(F.lit(HOT))
            .cast("long")
            .alias("k"),
            (F.col("id") % 1000).cast("double").alias("v"),
            F.concat(F.lit("payload-"), F.col("id")).alias("pad"),
        )
        .cache()
    )


@pytest.fixture(scope="module")
def small_dim(spark):
    return spark.range(100).select(
        F.col("id").alias("k"), F.concat(F.lit("dim-"), F.col("id")).alias("d")
    )


def test_salted_aggregate_matches_naive_under_hot_key(skewed_big):
    naive = {
        r.k: (r.n, r.s, r.mx)
        for r in skewed_big.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"), F.max("v").alias("mx"))
        .collect()
    }
    got = {
        r.k: (r.n, r.s, r.mx)
        for r in salted_aggregate(
            skewed_big,
            ["k"],
            {"n": ("count", "*"), "s": ("sum", "v"), "mx": ("max", "v")},
            n_salts=16,
        ).collect()
    }
    assert got == naive
    assert naive[HOT][0] > 0.9 * N_BIG  # the fixture really is skewed


def test_salt_spreads_hot_key_across_reducers(skewed_big):
    """The point of salting: the hot key's rows must land in many
    phase-1 groups, not one."""
    n_salts = 16
    salts = (
        skewed_big.filter(F.col("k") == HOT)
        .select(_det_salt(skewed_big, ["k"], n_salts).alias("salt"))
        .distinct()
        .count()
    )
    assert salts == n_salts


def test_salted_join_matches_naive_under_hot_key(skewed_big, small_dim):
    naive = (
        skewed_big.join(small_dim, "k")
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.min("d").alias("d0"))
    )
    got = (
        salted_join(skewed_big, small_dim, ["k"], n_salts=8)
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.min("d").alias("d0"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, naive.collect()))


def test_aqe_skew_join_split_fires(spark, skewed_big, small_dim):
    """With thresholds scaled to fixture bytes (production defaults are
    256MB/5x-median — same mechanism), AQE must mark the hot partition
    skewed and split it: the final adaptive plan carries skew=true."""
    overrides = {
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.join.preferSortMergeJoin": "true",
    }
    saved = {k: spark.conf.get(k, None) for k in overrides}
    try:
        for k, v in overrides.items():
            spark.conf.set(k, v)
        joined = skewed_big.join(small_dim, "k").select("k", "v", "d")
        # collect() THIS DataFrame so its own adaptive execution
        # finalizes (a count() would run a different QueryExecution)
        assert len(joined.collect()) == N_BIG  # correctness unaffected
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
