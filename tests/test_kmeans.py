"""Distributed k-means (ml/kmeans.py): assignment kernel, Lloyd
convergence, empty-cluster retention, objective decrease."""

from __future__ import annotations

import numpy as np
import pytest

from big_data_pipeline_spark.ml.kmeans import (
    assign_clusters_np,
    inertia,
    init_centroids,
    kmeans_fit,
)


def _blobs(spark, n_per=30, seed=7):
    """Three well-separated 4-d blobs with deterministic ids: blob i is
    centered at 10*i on every axis, noise << separation."""
    rng = np.random.default_rng(seed)
    rows = []
    for b in range(3):
        pts = rng.normal(10.0 * b, 0.5, size=(n_per, 4))
        # interleave ids across blobs (i*3+b) so the deterministic
        # first-k init spans the space, as shuffled corpus ids would
        rows += [
            (i * 3 + b, [float(v) for v in pts[i]], b) for i in range(n_per)
        ]
    return spark.createDataFrame(rows, ["vec_id", "embedding", "true_blob"])


def test_assign_clusters_np_exact_nearest(spark):
    df = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [5.0, 5.0]), (2, [2.4, 2.4]), (3, [2.6, 2.6])],
        ["vec_id", "embedding"],
    )
    cents = np.array([[0.0, 0.0], [5.0, 5.0]])
    got = {
        r["vec_id"]: (r["cluster_id"], r["dist_sq"])
        for r in assign_clusters_np(df, cents).collect()
    }
    assert got[0] == (0, 0.0)
    assert got[1] == (1, 0.0)
    assert got[2][0] == 0 and got[3][0] == 1
    assert got[2][1] == pytest.approx(2 * 2.4**2)


def test_assign_ties_break_to_lowest_cluster_id(spark):
    df = spark.createDataFrame([(0, [1.0, 0.0])], ["vec_id", "embedding"])
    cents = np.array([[0.0, 0.0], [2.0, 0.0]])  # equidistant
    assert assign_clusters_np(df, cents).first()["cluster_id"] == 0


def test_init_centroids_deterministic(spark):
    df = _blobs(spark)
    c = init_centroids(df, 4)
    first4 = {r["vec_id"]: r["embedding"] for r in df.filter("vec_id < 4").collect()}
    assert c.shape == (4, 4)
    for i in range(4):
        assert c[i].tolist() == first4[i]


def test_kmeans_recovers_blobs_and_objective_decreases(spark):
    df = _blobs(spark)
    c0 = init_centroids(df, 3)
    j0 = inertia(df, c0)
    cents = kmeans_fit(df, k=3, iters=10)
    j1 = inertia(df, cents)
    assert j1 <= j0
    # every blob maps to exactly one cluster and vice versa
    out = assign_clusters_np(df, cents).select("true_blob", "cluster_id").collect()
    mapping = {}
    for r in out:
        mapping.setdefault(r["true_blob"], set()).add(r["cluster_id"])
    assert all(len(v) == 1 for v in mapping.values())
    assert len({next(iter(v)) for v in mapping.values()}) == 3
    # converged centroids sit near the true blob centers
    recovered = sorted(round(float(c[0]) / 10) for c in cents)
    assert recovered == [0, 1, 2]


def test_kmeans_keeps_empty_cluster_centroid(spark):
    # vec_id 1 duplicates vec_id 0 (real corpora have duplicate
    # vectors), so init centroids 0 and 1 coincide; the tie-break sends
    # every point to centroid 0 and centroid 1 is empty from round one.
    # Its position must carry over unchanged, not NaN out.
    df = spark.createDataFrame(
        [
            (0, [0.0, 0.0]),
            (1, [0.0, 0.0]),
            (2, [50.0, 50.0]),
            (3, [50.1, 50.0]),
        ],
        ["vec_id", "embedding"],
    )
    cents = kmeans_fit(df, k=3, iters=5)
    assert not np.isnan(cents).any()
    assigned = assign_clusters_np(df, cents)
    n_used = assigned.select("cluster_id").distinct().count()
    assert n_used == 2  # one centroid stays empty but intact


def test_zca_whitening_identity_covariance(spark, sf_dir):
    """Whitened output must have identity covariance (the statistical
    contract), preserve row count/ids, and the fit must come from one
    aggregate pass — no row data on the driver."""
    import numpy as np
    from pyspark.sql import functions as F

    from big_data_pipeline_spark.io import read_table
    from big_data_pipeline_spark.ml.whiten import whiten_embeddings

    emb = read_table(spark, sf_dir, "embeddings")
    out = whiten_embeddings(emb).cache()
    assert out.count() == emb.count()
    pdf = out.select("vec_id", "whitened").toPandas()
    z = np.vstack(pdf["whitened"].to_numpy())
    cov = np.cov(z, rowvar=False, bias=True)
    d = z.shape[1]
    assert np.abs(cov - np.eye(d)).max() < 1e-6
    # mean is removed
    assert np.abs(z.mean(axis=0)).max() < 1e-9
    # deterministic ids preserved
    assert sorted(pdf["vec_id"]) == sorted(
        r.vec_id for r in emb.select("vec_id").collect()
    )


def test_kmeans_topic_terms_shape_and_ordering(spark):
    """Cluster labeling: every cluster gets <= TOP_N terms with
    contiguous ranks and non-increasing scores; scores obey the
    tf * (K+1)/(df+1) formula."""
    from big_data_pipeline_spark.workloads.similarity import (
        _KMEANS_K,
        _TOPIC_TOP_N,
        kmeans_topic_terms,
    )

    rows = kmeans_topic_terms(spark, "/root/testdata/sf0.001").collect()
    assert rows
    per = {}
    for r in rows:
        assert 0 <= r.cluster_id < _KMEANS_K
        assert r.score == r.tf_c * ((_KMEANS_K + 1) / (r.df_c + 1))
        per.setdefault(r.cluster_id, []).append(r)
    for terms in per.values():
        terms.sort(key=lambda r: r.term_rank)
        assert [t.term_rank for t in terms] == list(range(1, len(terms) + 1))
        assert len(terms) <= _TOPIC_TOP_N
        scores = [t.score for t in terms]
        assert scores == sorted(scores, reverse=True)
