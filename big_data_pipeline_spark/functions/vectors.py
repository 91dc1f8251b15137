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

from pyspark.sql import Column
from pyspark.sql import functions as F

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
