"""Driver-solved graph loops must equal their distributed twins.

r10: bfs/sssp/kcore/closeness gate driver-small edge sets (aggregated
nation graphs are key-cardinality-bounded) into numpy solvers that
replicate each distributed loop's exact synchronous round structure.
These tests pin driver ≡ distributed both on the real queries (gate on
vs forced off via the module constant) and on crafted graphs through
the exposed ``kcore_peel``.
"""

from __future__ import annotations

import pytest

import big_data_pipeline_spark.workloads.graph_rank as gr


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize(
    "name",
    [
        "bfs_trade_hops",
        "sssp_trade_cost",
        "closeness_trade_centrality",
        "lpa_trade_communities",
    ],
)
def test_graph_query_driver_equals_distributed(
    spark, sf_dir, name, monkeypatch
):
    fn = getattr(gr, name)
    with_driver = _rows(fn(spark, sf_dir))
    monkeypatch.setattr(gr, "_GRAPH_DRIVER_MAX_EDGES", 0)
    without = _rows(fn(spark, sf_dir))
    assert with_driver == without


def test_kcore_query_driver_equals_distributed(spark, sf_dir, monkeypatch):
    with_driver = _rows(gr.kcore_trade_graph(spark, sf_dir))
    monkeypatch.setattr(gr, "_GRAPH_DRIVER_MAX_EDGES", 0)
    without = _rows(gr.kcore_trade_graph(spark, sf_dir))
    assert with_driver == without


@pytest.mark.parametrize(
    "edges,k",
    [
        # triangle + tail: the tail peels off, the triangle is the 2-core
        ([(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)], 2),
        # 4-clique with a pendant: 3-core = the clique
        ([(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5)], 3),
        # pure chain: 2-core is empty (multi-round cascade peel)
        ([(i, i + 1) for i in range(1, 12)], 2),
        # two components, one surviving
        ([(1, 2), (2, 3), (1, 3), (10, 11)], 2),
    ],
)
def test_kcore_peel_driver_equals_distributed(spark, edges, k):
    und = spark.createDataFrame(edges, "a long, b long")
    driver = _rows(gr.kcore_peel(und, k))
    dist = _rows(gr.kcore_peel(und, k, driver_max_edges=0))
    assert driver == dist


def test_closeness_driver_declines_past_node_bound(spark, monkeypatch):
    # above the dense-matrix node bound the helper returns None and the
    # query must fall through to the distributed loop
    import pandas as pd

    monkeypatch.setattr(gr, "_CLOSENESS_DRIVER_MAX_NODES", 3)
    pdf = pd.DataFrame({"a": [1, 2, 3, 4], "b": [2, 3, 4, 1]})
    assert gr._closeness_driver(pdf, 6) is None
