"""Connected-components clustering on literal graphs.

Both operators carry a driver union-find fast path for driver-small
edge sets (same device as pagerank's driver power iteration); the
distributed loops are forced with ``driver_max_edges=0`` so every test
exercises the path it names, and a dedicated test pins driver ≡
distributed equivalence.
"""

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
    expect = {1: 1, 2: 1, 3: 1, 4: 4, 5: 4, 6: 6, 7: 6, 8: 6}
    got = dict(connected_components(edges).collect())  # driver path
    assert got == expect
    got_dist = dict(
        connected_components(edges, driver_max_edges=0).collect()
    )
    assert got_dist == expect


def test_connected_components_long_path_converges(spark):
    # path 0-1-...-9: worst-case diameter for label propagation —
    # forced distributed so the loop itself is what converges
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(9)], ["src", "dst"]
    )
    got = dict(connected_components(edges, driver_max_edges=0).collect())
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


def test_star_cc_equals_propagation_on_chain(spark):
    """64-node chain: diameter is the propagation loop's worst case
    (O(d) rounds); the star algorithm converges in O(log d) and must
    produce identical components. Both forced distributed."""
    from big_data_pipeline_spark.dedup.clusters import (
        connected_components,
        connected_components_star,
    )

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(64)], "src long, dst long"
    )
    a = {
        (r.id, r.cluster_id)
        for r in connected_components(
            chain, max_iter=200, driver_max_edges=0
        ).collect()
    }
    b = {
        (r.id, r.cluster_id)
        for r in connected_components_star(
            chain, driver_max_edges=0
        ).collect()
    }
    assert a == b
    assert b == {(i, 0) for i in range(65)}


def test_star_cc_random_graph_and_degenerates(spark):
    import random

    from big_data_pipeline_spark.dedup.clusters import (
        connected_components,
        connected_components_star,
    )

    rng = random.Random(11)
    edges = [(rng.randrange(60), rng.randrange(60)) for _ in range(50)]
    edges += [(7, 7), (58, 59), (59, 58)]  # self-loop + reciprocal pair
    df = spark.createDataFrame(edges, "src long, dst long")
    a = {
        (r.id, r.cluster_id)
        for r in connected_components(
            df, max_iter=200, driver_max_edges=0
        ).collect()
    }
    b = {
        (r.id, r.cluster_id)
        for r in connected_components_star(df, driver_max_edges=0).collect()
    }
    assert a == b


def test_driver_union_find_equals_distributed(spark):
    """The driver fast path must be bit-identical to both distributed
    loops on a messy graph (self-loops, duplicates, islands, a chain)."""
    import random

    from big_data_pipeline_spark.dedup.clusters import (
        connected_components,
        connected_components_star,
    )

    rng = random.Random(23)
    edges = [(rng.randrange(40), rng.randrange(40)) for _ in range(45)]
    edges += [(i + 100, i + 101) for i in range(20)]  # long chain island
    edges += [(5, 5), (200, 201), (201, 200)]
    df = spark.createDataFrame(edges, "src long, dst long")
    drv = {(r.id, r.cluster_id) for r in connected_components(df).collect()}
    drv_star = {
        (r.id, r.cluster_id) for r in connected_components_star(df).collect()
    }
    dist = {
        (r.id, r.cluster_id)
        for r in connected_components(
            df, max_iter=200, driver_max_edges=0
        ).collect()
    }
    assert drv == dist
    assert drv_star == dist


def test_star_cc_raises_on_nonconvergence(spark):
    import pytest

    from big_data_pipeline_spark.dedup.clusters import connected_components_star

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(64)], "src long, dst long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components_star(chain, max_iter=1, driver_max_edges=0)
