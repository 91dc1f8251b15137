"""Distributed k-means over embedding columns (Lloyd's algorithm).

The training-data use case is semantic clustering: group documents by
embedding so downstream curation can balance a mix, drop degenerate
clusters, or route near-duplicate detection per cluster (the IVF
quantizer in similarity/knn.py is exactly a one-iteration special case
of this trainer).

Scale design (100 TB):
- Centroids are MODEL-sized (k x dims doubles) — they live on the
  driver between iterations and ship to executors as a broadcast
  numpy array inside an Arrow-batched ``mapInPandas``. The corpus is
  never shuffled for assignment: one narrow pass per iteration, argmin
  over a (batch x k) BLAS distance matrix.
- The update step is one ``groupBy(cluster)`` aggregation of per-dim
  sums + counts — map-side partial aggregation keeps the shuffle at
  k x dims doubles per partition, independent of corpus size.
- Iterations are driver-bounded (``iters``), so lineage stays shallow;
  no checkpointing needed.
- Init is deterministic (first k vectors by id) — reproducible runs
  beat RNG placement for pipeline auditability; k-means++ on a capped
  sample is a drop-in refinement.

The one-pass ASSIGNMENT (deterministic centroids -> nearest centroid)
is exactly SQL-expressible and oracle-checked in
workloads/similarity.py (``kmeans_assign_embeddings``) via the
left-associated ``l2_sq_sql``/``seq_l2_sq`` kernel pair; this module's
iterative trainer is covered by convergence tests
(tests/test_kmeans.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def assign_clusters_np(
    df: DataFrame,
    centroids: np.ndarray,
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign every row to its nearest centroid (squared L2, ties to the
    lowest cluster id). ``centroids`` is a (k, dims) numpy array closed
    over by the UDF — Spark broadcasts it with the serialized task, one
    copy per executor. One narrow pass, no shuffle, no k-fold row
    amplification: distances come from the ||x||^2 - 2xC^T + ||c||^2
    expansion, a single (batch x k) BLAS matmul per Arrow batch."""
    out_schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("cluster_id", T.IntegerType()),
            T.StructField("dist_sq", T.DoubleType()),
        ]
    )
    c = np.ascontiguousarray(centroids, dtype=np.float64)
    c_sq = (c * c).sum(axis=1)

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            x = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            d = (x * x).sum(axis=1, keepdims=True) - 2.0 * (x @ c.T) + c_sq
            pdf = pdf.copy()
            # argmin returns the FIRST minimal index — the lowest
            # cluster id, matching the SQL tie-break convention
            pdf["cluster_id"] = d.argmin(axis=1).astype(np.int32)
            pdf["dist_sq"] = d.min(axis=1)
            yield pdf

    return df.mapInPandas(assign, schema=out_schema)


def init_centroids(
    df: DataFrame, k: int, vec_col: str = "embedding", id_col: str = "vec_id"
) -> np.ndarray:
    """Deterministic init: the k vectors with the smallest ids (a
    model-sized driver collect, same budget class as the IVF coarse
    quantizer)."""
    rows = df.select(id_col, vec_col).orderBy(id_col).limit(k).collect()
    return np.array([r[vec_col] for r in rows], dtype=np.float64)


def kmeans_fit(
    df: DataFrame,
    k: int = 8,
    iters: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    tol: float = 1e-9,
) -> np.ndarray:
    """Lloyd's iterations: assign (narrow pass) then update (one
    groupBy of per-dim sums/counts — the only shuffle, k x dims wide).
    Empty clusters keep their previous centroid. Stops early when the
    max centroid movement falls below ``tol``."""
    dims = len(df.select(vec_col).first()[0])
    centroids = init_centroids(df, k, vec_col, id_col)
    for _ in range(iters):
        assigned = assign_clusters_np(df.select(id_col, vec_col), centroids, vec_col)
        stats = (
            assigned.groupBy("cluster_id")
            .agg(
                F.count(F.lit(1)).alias("n"),
                *[
                    F.sum(F.col(vec_col)[i].cast("double")).alias(f"s{i}")
                    for i in range(dims)
                ],
            )
            .collect()
        )
        new = centroids.copy()
        for r in stats:
            cid = r["cluster_id"]
            new[cid] = [r[f"s{i}"] / r["n"] for i in range(dims)]
        moved = float(np.abs(new - centroids).max())
        centroids = new
        if moved < tol:
            break
    return centroids


def inertia(df: DataFrame, centroids: np.ndarray, vec_col: str = "embedding") -> float:
    """Total within-cluster squared distance (the k-means objective)."""
    assigned = assign_clusters_np(df.select(vec_col), centroids, vec_col)
    return assigned.agg(F.sum("dist_sq")).first()[0]
