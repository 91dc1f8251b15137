"""Interval-overlap join (exactly-once bucketing) and golden-record
survivorship invariants."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from big_data_pipeline_spark.operators import interval_overlap_join
from big_data_pipeline_spark.workloads.dedup import golden_record_merge
from big_data_pipeline_spark.workloads.timeseries import (
    promo_interval_overlap,
)


def _t(day: int, hour: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, day, hour)


def test_interval_overlap_matches_bruteforce_no_dupes(spark):
    # intervals shorter, longer, and much longer than the bin width,
    # plus touching endpoints (closed-interval semantics)
    left = spark.createDataFrame(
        [
            (1, _t(1), _t(2)),
            (2, _t(3), _t(10)),
            (3, _t(5, 12), _t(5, 13)),
            (4, _t(20), _t(28)),
            (5, _t(2), _t(3)),  # touches r10's start exactly
        ],
        "lid int, ls timestamp, le timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, _t(3), _t(4)),
            (11, _t(1, 6), _t(9)),
            (12, _t(25), _t(26)),
            (13, _t(15), _t(16)),
        ],
        "rid int, rs timestamp, re timestamp",
    )
    got = interval_overlap_join(
        left, right, "ls", "le", "rs", "re", bin_sec=2 * 86400
    ).select("lid", "rid")
    brute = (
        left.crossJoin(right)
        .filter((F.col("ls") <= F.col("re")) & (F.col("rs") <= F.col("le")))
        .select("lid", "rid")
    )
    g = sorted((r.lid, r.rid) for r in got.collect())
    b = sorted((r.lid, r.rid) for r in brute.collect())
    assert g == b  # same set AND same multiplicity (exactly-once)
    assert len(g) == len(set(g))
    assert (1, 11) in g and (5, 10) in g  # closed-end touch included
    assert (4, 13) not in g


def test_promo_overlap_counts_are_disjoint_order_hits(spark, sf_dir):
    out = {r.promo_id: r for r in promo_interval_overlap(spark, sf_dir).collect()}
    assert out, "at least one promo window must match the corpus"
    for r in out.values():
        assert r.n_orders > 0 and r.revenue > 0


def test_golden_record_survivorship(spark):
    # sf0.001's part table is too small to contain linked profiles;
    # sf0.01 is the smallest corpus with a non-empty linkage graph
    rows = golden_record_merge(spark, "/root/testdata/sf0.01").collect()
    assert rows, "linkage fixture must produce at least one merged entity"
    for r in rows:
        # a merged entity always absorbs >= 2 linked profiles
        assert r.n_profiles >= 2
        assert r.n_records >= r.n_profiles
        # first-record survivorship: golden id names the cluster
        assert r.golden_id == r.cluster_id or r.golden_id >= 0
        assert r.name


def test_grid_density_clusters_partition_and_noise(spark):
    from big_data_pipeline_spark.workloads.similarity import (
        grid_density_clusters,
    )

    df = grid_density_clusters(spark, "/root/testdata/sf0.01")
    rows = df.collect()
    n_emb = spark.read.parquet(
        "/root/testdata/sf0.01/embeddings.parquet"
    ).count()
    # every vector labeled exactly once
    assert len(rows) == n_emb
    assert len({r.vec_id for r in rows}) == n_emb
    core = [r for r in rows if r.is_core]
    noise = [r for r in rows if r.cluster_id == -1]
    assert core and noise, "fixture must yield both core and noise points"
    assert all(r.cluster_id >= 0 for r in core)
    # border points only ever join an existing core cluster
    core_clusters = {r.cluster_id for r in core}
    for r in rows:
        if not r.is_core and r.cluster_id != -1:
            assert r.cluster_id in core_clusters
    assert len(core_clusters) >= 2, "grid parameters must fragment the blob"
