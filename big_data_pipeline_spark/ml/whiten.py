"""ZCA whitening for embedding columns — model fit on aggregates,
applied distributed.

The ANN/near-dup preprocessing step: decorrelate and unit-scale the
embedding dimensions so cosine/L2 geometry stops being dominated by a
few high-variance axes (whitening before quantization or LSH measurably
improves recall on anisotropic corpora).

Scale shape (the part that matters at 100 TB):
- FIT: each partition reduces its Arrow batches to one 64x64 partial
  second-moment matrix + mean vector + count with BLAS (``x.T @ x``),
  then emits them as (i, j, value) triplets — a few thousand rows PER
  PARTITION regardless of row count. One map-side-combinable
  groupBy(i, j) sum later, the driver holds the exact global moments:
  an O(d^2) MODEL, like the IVF centroids, never row data.
- The eigendecomposition of the 64x64 covariance runs on the driver
  (``numpy.linalg.eigh`` — microseconds; no distributed linear algebra
  needed for model-sized matrices).
- APPLY: one mapInPandas scan multiplies each batch by the whitening
  matrix. No shuffle anywhere in the apply path.

Float determinism: partial sums reduce in partition order, so the last
ulp of the fitted model can vary with partitioning — this is a fitted
MODEL (like k-means centroids), not an oracle-checked relational
result; tests assert the statistical contract (output covariance == I
to 1e-8, idempotence of re-fit) rather than bit equality.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fit_whitening(
    df: DataFrame, vec_col: str = "embedding", eps: float = 1e-9
) -> tuple[np.ndarray, np.ndarray]:
    """Return (mean, W) with W the symmetric ZCA matrix
    ``C^(-1/2) = V diag(1/sqrt(l+eps)) V^T``."""

    def partials(batches):
        for pdf in batches:
            x = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            d = x.shape[1]
            xtx = x.T @ x
            s = x.sum(axis=0)
            i, j = np.meshgrid(np.arange(d), np.arange(d), indexing="ij")
            yield pd.DataFrame(
                {
                    "i": np.concatenate([i.ravel(), np.arange(d), [-1]]),
                    "j": np.concatenate([j.ravel(), np.full(d, -1), [-1]]),
                    "v": np.concatenate([xtx.ravel(), s, [float(len(x))]]),
                }
            )

    rows = (
        df.select(vec_col)
        .mapInPandas(partials, "i int, j int, v double")
        .groupBy("i", "j")
        .agg(F.sum("v").alias("v"))
        .collect()
    )
    d = max(r.i for r in rows) + 1
    xtx = np.zeros((d, d))
    s = np.zeros(d)
    n = 0.0
    for r in rows:
        if r.i == -1:
            n = r.v
        elif r.j == -1:
            s[r.i] = r.v
        else:
            xtx[r.i, r.j] = r.v
    mean = s / n
    cov = xtx / n - np.outer(mean, mean)
    lam, vecs = np.linalg.eigh(cov)
    w = (vecs * (1.0 / np.sqrt(np.maximum(lam, 0.0) + eps))) @ vecs.T
    return mean, w


def whiten_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    out_col: str = "whitened",
    eps: float = 1e-9,
) -> DataFrame:
    """Append ``out_col`` = ZCA-whitened ``vec_col`` (output covariance
    is the identity up to eps). Fit is one aggregate pass; apply is one
    shuffle-free Arrow scan."""
    mean, w = fit_whitening(df, vec_col, eps)
    other = [c for c in df.columns]
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + f", {out_col} array<double>"

    def apply(batches):
        for pdf in batches:
            x = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            z = (x - mean) @ w
            out = pdf[other].copy()
            out[out_col] = list(z)
            yield out

    return df.mapInPandas(apply, schema)
