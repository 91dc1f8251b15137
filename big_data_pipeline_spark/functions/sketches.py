"""KMV / theta sketches: mergeable distinct-count with SET OPERATIONS.

Complements the HLL rollup in ``workloads/llm_pipeline.py``: HLL
sketches union-merge, but cannot estimate INTERSECTIONS or differences
— the theta-sketch family can (Dasgupta et al., "Theta sketches" /
Apache DataSketches theory). This is the k-minimum-values variant:

- sketch of a set = the k smallest values of u(x) = xxhash64(x)
  normalized into [0,1); if fewer than k distinct values exist the
  sketch IS the set (estimates become exact).
- estimate: (k-1) / kth_min  (the classic KMV estimator).
- union: merge value arrays, keep the k smallest.
- intersection (theta style): theta = min of the two sketch
  thresholds; count shared values below theta; estimate = count/theta.

Everything is deterministic (seeded xxhash64, no RNG), so results are
stable across runs — but the estimator is engine-specific, hence the
workload using it is a rows-only check with accuracy asserted in
tests. Scale shape: the per-group sketch build is one shuffle
(distinct) + one window top-k; sketches are k doubles (~8 KB at
k=1024) regardless of group size, so cross-group set algebra is
driver-light array math on tiny frames, exactly like the DataSketches
workflow on a warehouse at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# 60-bit md5-prefix hash → [0,1). Chosen over xxhash64 (rounds 1-5)
# for the same reason sample_bottomk_docs uses an LCG and simhash uses
# md5 halves: any engine evaluates md5(decimal-string) identically, so
# the WHOLE theta-sketch pipeline becomes cross-engine replayable and
# the workload upgrades from a rows-only to a cell-exact hash check.
# 15 hex nibbles = 60 bits keeps the integer exact in BIGINT on both
# engines (16 nibbles would overflow signed int64); the division by
# 2^60 is an exact power-of-two scale. Collisions (~n²/2^60) are far
# below estimator noise.
_SCALE_BITS = 60


def normalized_hash(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    v = F.conv(
        F.substring(F.md5(c.cast("string").cast("binary")), 1, 15), 16, 10
    ).cast("bigint")
    return v / F.lit(float(1 << _SCALE_BITS))


def normalized_hash_sql(expr: str) -> str:
    """DuckDB twin of ``normalized_hash`` over a SQL expression."""
    hexd = "0123456789abcdef"
    terms = " + ".join(
        f"(strpos('{hexd}', substring(md5(CAST({expr} AS VARCHAR)), "
        f"{i + 1}, 1)) - 1) * {16 ** (14 - i)}"
        for i in range(15)
    )
    return f"(({terms}) / {float(1 << _SCALE_BITS)!r})"


def kmv_sketch(
    df: DataFrame, group_col: str, value_col: str, k: int
) -> DataFrame:
    """Per-group KMV sketch: (group, sketch array<double> sorted asc,
    n_distinct).

    The k smallest hashes per group use ``row_number <= k``, which the
    optimizer rewrites to WindowGroupLimit — each input partition keeps
    only its local top-k BEFORE the shuffle, so a low-cardinality group
    column doesn't funnel the whole distinct set through one task. The
    exact per-group count deliberately does NOT ride along as an
    unordered window over the same partitioning (that window would
    process every group in one task); it's a map-side-combinable
    groupBy joined back broadcast — groups are few by construction.
    """
    distinct = (
        df.select(group_col, value_col)
        .distinct()
        .withColumn("__u", normalized_hash(value_col))
    )
    counts = distinct.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_distinct")
    )
    w = Window.partitionBy(group_col).orderBy("__u")
    return (
        distinct.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .groupBy(group_col)
        .agg(
            F.sort_array(F.collect_list("__u")).alias("sketch"),
            F.max("__rn").alias("n_kept"),
        )
        .join(F.broadcast(counts), group_col)
    )


def kmv_estimate(sketch: Column, n_distinct: Column, k: int) -> Column:
    """(k-1)/kth_min when the sketch is full, else the exact count."""
    return F.when(
        F.size(sketch) < k, n_distinct.cast("double")
    ).otherwise(F.lit(k - 1) / F.try_element_at(sketch, F.lit(k)))


def kmv_union_estimate(a: Column, b: Column, k: int) -> Column:
    """Distinct-count estimate of A ∪ B from two sketch arrays."""
    merged = F.slice(F.array_sort(F.array_union(a, b)), 1, k)
    return F.when(
        F.size(merged) < k, F.size(merged).cast("double")
    ).otherwise(F.lit(k - 1) / F.try_element_at(merged, F.lit(k)))


def misra_gries_topk(
    df: DataFrame, value_col: str, k: int, top: int = 10
) -> DataFrame:
    """Heavy hitters with FIXED memory per partition (Misra-Gries).

    Exact groupBy-count keeps one state entry per distinct key — fine
    until key cardinality explodes (raw n-grams over a 100 TB corpus).
    Misra-Gries keeps at most ``k`` weighted counters per partition:
    inserting a batch's counts then repeatedly draining the minimum
    counter whenever more than k survive. Guarantees per summary:
    every item with true frequency > N_partition/(k+1) is present, and
    est ≤ true ≤ est + N_partition/(k+1). Summaries merge by summing
    (the shuffle moves ≤ partitions×k rows, never the raw keys), and
    the merged lower bounds rank the heavy hitters.

    Returns the ``top`` rows: (value, est_count) by descending
    estimate; ties broken by value for determinism.
    """
    import pandas as pd

    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField("value", StringType()),
            StructField("weight", LongType()),
        ]
    )

    def partial(batches):
        counters: dict[str, int] = {}
        for pdf in batches:
            for val, cnt in pdf[value_col].value_counts().items():
                counters[val] = counters.get(val, 0) + int(cnt)
            while len(counters) > k:
                d = min(counters.values())
                counters = {
                    v: c - d for v, c in counters.items() if c - d > 0
                }
        yield pd.DataFrame(
            {"value": list(counters), "weight": list(counters.values())}
        )

    summaries = df.select(F.col(value_col).cast("string").alias(value_col))
    return (
        summaries.mapInPandas(partial, schema=out_schema)
        .groupBy("value")
        .agg(F.sum("weight").alias("est_count"))
        .orderBy(F.desc("est_count"), F.asc("value"))
        .limit(top)
    )


def kmv_intersect_estimate(a: Column, b: Column, k: int) -> Column:
    """Theta-style A ∩ B estimate: shared values below the smaller
    threshold, scaled by it. Thresholds are 1.0 for non-full sketches
    (they hold their whole set)."""
    theta_a = F.when(F.size(a) < k, F.lit(1.0)).otherwise(
        F.try_element_at(a, F.lit(k))
    )
    theta_b = F.when(F.size(b) < k, F.lit(1.0)).otherwise(
        F.try_element_at(b, F.lit(k))
    )
    theta = F.least(theta_a, theta_b)
    shared = F.size(
        F.filter(F.array_intersect(a, b), lambda u: u < theta)
    )
    return shared.cast("double") / theta
