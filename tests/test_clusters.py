"""Connected-components clustering on literal graphs."""

from __future__ import annotations

from big_data_pipeline_spark.dedup.clusters import (
    connected_components,
    dedup_representatives,
)


def test_connected_components_chain_and_islands(spark):
    # 1-2-3 chain, 4-5 pair, 6-7-8 triangle: 3 components
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5), (6, 7), (7, 8), (6, 8)], ["src", "dst"]
    )
    got = dict(connected_components(edges).collect())
    assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4, 6: 6, 7: 6, 8: 6}


def test_connected_components_long_path_converges(spark):
    # path 0-1-...-9: worst-case diameter for label propagation
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(9)], ["src", "dst"]
    )
    got = dict(connected_components(edges).collect())
    assert got == {i: 0 for i in range(10)}


def test_dedup_representatives_keeps_min_and_untouched(spark):
    docs = spark.createDataFrame(
        [(i, f"d{i}") for i in range(1, 7)], ["doc_id", "text"]
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], ["doc_id1", "doc_id2"]
    )
    kept = sorted(
        r.doc_id for r in dedup_representatives(docs, pairs).collect()
    )
    # cluster {1,2,3} -> keep 1; {5,6} -> keep 5; 4 untouched
    assert kept == [1, 4, 5]
