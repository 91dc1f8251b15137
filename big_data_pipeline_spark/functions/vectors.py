"""Vector kernels over array<float> embedding columns.

Two forms for each kernel:

- A Spark Column builder (``dot``, ``sq_norm``, ``cosine``) using
  higher-order functions — concise, for general use.
- An *unrolled* expression-string generator (``dot_sql`` / ``sq_norm_sql``)
  emitting an explicit left-associated chain
  ``a[0]*b[0] + a[1]*b[1] + ...`` for a fixed dimension. The unrolled
  form is what the oracle-checked queries use on BOTH engines: double
  IEEE-754 arithmetic with a fixed association order is bit-identical
  in Spark and DuckDB, so cosine scores (and the ranks derived from
  them) hash-match exactly with no rounding. It also compiles to a flat
  codegen expression — the fastest JVM-side formulation short of SIMD.

``spark`` indexing is 0-based, DuckDB list indexing is 1-based; the
generators take an ``offset`` to cover both.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.pandas.functions import pandas_udf

# Dimensionality of the test corpus's embedding column (FIXTURES.md).
EMB_DIMS_DEFAULT = 64


def dot(a: Column, b: Column) -> Column:
    """Dot product via zip_with + aggregate (left fold, in order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def sq_norm(a: Column) -> Column:
    return dot(a, a)


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(sq_norm(a)) * F.sqrt(sq_norm(b)))


def dot_sql(a: str, b: str, dims: int, offset: int = 0) -> str:
    """Unrolled dot-product expression string (see module docstring)."""
    return " + ".join(
        f"CAST({a}[{i + offset}] AS DOUBLE) * CAST({b}[{i + offset}] AS DOUBLE)"
        for i in range(dims)
    )


def sq_norm_sql(a: str, dims: int, offset: int = 0) -> str:
    return dot_sql(a, a, dims, offset)


def cosine_sql(a: str, b: str, dims: int, offset: int = 0) -> str:
    return (
        f"({dot_sql(a, b, dims, offset)})"
        f" / (sqrt({sq_norm_sql(a, dims, offset)})"
        f" * sqrt({sq_norm_sql(b, dims, offset)}))"
    )


def _seq_cosine_kernel(
    a: pd.Series, b: pd.Series, a_sqn: pd.Series, b_sqn: pd.Series
) -> pd.Series:
    """dot(a,b)/(sqrt(|a|²)·sqrt(|b|²)) with LEFT-ASSOCIATED accumulation.

    The Arrow-batched twin of the unrolled SQL chain: ``acc + x_i*y_i``
    one dimension at a time keeps the exact IEEE-754 association of
    ``a[0]*b[0] + a[1]*b[1] + …`` (numpy's own ``dot``/``sum`` use
    pairwise/SIMD-blocked orders that differ in the last ulp and would
    break oracle value-hashes), while each step is one vectorized op
    over the whole batch. Spark refuses whole-stage codegen for the
    385-term unrolled chain (janino method-size limit), leaving the
    tree-walking interpreter — this UDF is ~5x faster at sf0.1 AND
    bit-identical. Callers precompute squared norms once per vector.
    """
    x = np.vstack(a.to_numpy()).astype(np.float64)
    y = np.vstack(b.to_numpy()).astype(np.float64)
    acc = x[:, 0] * y[:, 0]
    for i in range(1, x.shape[1]):
        acc = acc + x[:, i] * y[:, i]
    return pd.Series(
        acc / (np.sqrt(a_sqn.to_numpy()) * np.sqrt(b_sqn.to_numpy()))
    )


seq_cosine = pandas_udf(T.DoubleType())(_seq_cosine_kernel)

# Optimizer-fenced twin for SCORE-THEN-FILTER call sites: on a
# deterministic pandas UDF, Catalyst pushes a filter on the score
# column below the projection and evaluates the kernel in TWO
# ArrowEvalPython nodes (once for the filter, once for the output
# column) — doubling the dominant pair-scoring cost. The kernel is
# pure; the nondeterministic flag only stops that pushdown so the
# score is computed once and the filter reads the materialized column.
# A SEPARATE UDF instance is mandatory: pyspark's asNondeterministic()
# MUTATES the underlying UserDefinedFunction in place and returns
# self, so fencing the shared ``seq_cosine`` at a call site would
# silently change every other query's plan for the rest of the
# process (query-order-dependent plans in the sweep).
seq_cosine_fenced = pandas_udf(T.DoubleType())(
    _seq_cosine_kernel
).asNondeterministic()


def l2_sq_sql(a: str, b: str, dims: int, offset: int = 0) -> str:
    """Unrolled squared-L2-distance expression string — same fixed
    left-association contract as ``dot_sql`` (bit-identical doubles on
    both engines)."""
    return " + ".join(
        f"(CAST({a}[{i + offset}] AS DOUBLE) - CAST({b}[{i + offset}] AS DOUBLE))"
        f" * (CAST({a}[{i + offset}] AS DOUBLE) - CAST({b}[{i + offset}] AS DOUBLE))"
        for i in range(dims)
    )


@pandas_udf(T.DoubleType())
def seq_l2_sq(a: pd.Series, b: pd.Series) -> pd.Series:
    """Squared L2 distance with LEFT-ASSOCIATED accumulation — the
    Arrow-batched twin of ``l2_sq_sql`` (same last-ulp contract as
    ``seq_cosine``): ``acc + (x_i-y_i)^2`` one dimension at a time,
    each step one vectorized numpy op over the batch."""
    x = np.vstack(a.to_numpy()).astype(np.float64)
    y = np.vstack(b.to_numpy()).astype(np.float64)
    d = x[:, 0] - y[:, 0]
    acc = d * d
    for i in range(1, x.shape[1]):
        d = x[:, i] - y[:, i]
        acc = acc + d * d
    return pd.Series(acc)
