"""App-level Bloom-filter join pruning (the runtime-filter pattern).

The scale problem: a fact⋈dim join where the dim side is filtered but
still too large to broadcast-hash-join (say 10M surviving keys at
100 TB). Spark then sort-merge-joins — shuffling the ENTIRE fact table,
even though only a sliver of it will survive the join. The classic fix
is a runtime filter: build a Bloom filter over the dim keys (a few MB
regardless of key count), broadcast it, and drop non-matching fact rows
BEFORE the shuffle. False positives only cost wasted shuffle bytes; the
exact join afterwards keeps results identical to the unfiltered plan —
which is why the workload using this operator is oracle-checked against
the plain join SQL.

Spark itself injects this shape in narrow cases
(``spark.sql.optimizer.runtime.bloomFilter.enabled``, see
``session.py``) — an equi-join whose creation side has a selective
filter. This operator is the explicit, composable version for the
plans the optimizer's heuristic misses (multi-hop pruning, pruning
before a non-equi post-condition, reusing one filter across several
facts).

Layout: ``num_bits`` bit slots backed by ``num_bits/64`` longs.
Everything data-sized stays JVM-side: the k probe positions are
``xxhash64(key, seed_i) mod m`` Spark expressions; the build aggregates
per-word OR-masks with ``bit_or`` so at most ``m/64`` rows ever reach
the driver — bounded by the filter size, NOT the dim cardinality. The
probe ships the bitmap via ``SparkContext.broadcast`` and tests k bits
per row in one Arrow-vectorized numpy gather.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def optimal_bits(n_keys: int, fpp: float = 0.01) -> tuple[int, int]:
    """Standard Bloom sizing: (num_bits rounded up to a word multiple,
    num_hashes) for a target false-positive probability."""
    m = max(64, int(-n_keys * math.log(fpp) / (math.log(2) ** 2)))
    m = ((m + 63) // 64) * 64
    k = max(1, round(m / max(n_keys, 1) * math.log(2)))
    return m, min(k, 16)


def bloom_positions(key: Column, num_bits: int, num_hashes: int) -> Column:
    """The k probe positions for one key, as an array<long> column.

    Seeded family via xxhash64(key, i) — k independent JVM-side hashes,
    no Python in the loop. NULL keys hash like a constant; they are
    neither specially kept nor dropped (the exact join after pruning
    discards them anyway under inner equi-join semantics).
    """
    return F.array(
        *[
            F.pmod(F.xxhash64(key, F.lit(i)), F.lit(num_bits))
            for i in range(num_hashes)
        ]
    )


def build_bloom(
    dim: DataFrame, key: str, num_bits: int, num_hashes: int
) -> np.ndarray:
    """Build the bitmap distributed: explode each key's k positions,
    OR the per-word masks with ``bit_or``, collect ≤ num_bits/64 rows."""
    words = (
        dim.select(
            F.explode(
                bloom_positions(F.col(key), num_bits, num_hashes)
            ).alias("pos")
        )
        .select(
            F.shiftright("pos", 6).alias("word"),
            F.expr("shiftleft(1L, CAST(pos % 64 AS INT))").alias("mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
        .collect()
    )
    bitmap = np.zeros(num_bits // 64, dtype=np.uint64)
    for row in words:
        bitmap[row["word"]] = np.uint64(row["bits"] & 0xFFFFFFFFFFFFFFFF)
    return bitmap


def might_contain_col(
    fact: DataFrame, key: str, bitmap: np.ndarray, num_hashes: int
) -> Column:
    """Boolean column: key *might* be in the set (no false negatives).

    Exposed separately from :func:`bloom_filter_rows` so callers can
    route BOTH sides of the test — e.g. the anti-join prune, where a
    ``false`` (definitely absent) is the useful outcome."""
    num_bits = bitmap.size * 64
    bc = fact.sparkSession.sparkContext.broadcast(bitmap)

    @pandas_udf("boolean")
    def might_contain(pos: pd.Series) -> pd.Series:
        if len(pos) == 0:
            return pd.Series([], dtype=bool)
        p = np.vstack(pos.to_numpy()).astype(np.int64)  # (batch, k)
        words = bc.value[p >> 6]
        bits = (words >> (p & 63).astype(np.uint64)) & np.uint64(1)
        return pd.Series(bits.all(axis=1))

    return might_contain(bloom_positions(F.col(key), num_bits, num_hashes))


def bloom_filter_rows(
    fact: DataFrame, key: str, bitmap: np.ndarray, num_hashes: int
) -> DataFrame:
    """Keep only fact rows whose key might be in the set (no false
    negatives — every true match survives)."""
    return fact.filter(might_contain_col(fact, key, bitmap, num_hashes))


def bloom_pruned_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    fpp: float = 0.01,
    n_keys: int | None = None,
) -> DataFrame:
    """Exact inner equi-join with a Bloom pre-prune of the fact side.

    ``n_keys`` sizes the filter; when omitted it is counted with one
    extra pass over the (small-ish, already-filtered) dim side. Result
    rows are identical to ``fact.join(dim, ...)`` — the Bloom stage can
    only let extra rows through to the exact join, never drop a match.
    """
    if n_keys is None:
        n_keys = dim.select(dim_key).distinct().count()
    num_bits, num_hashes = optimal_bits(n_keys, fpp)
    bitmap = build_bloom(dim, dim_key, num_bits, num_hashes)
    pruned = bloom_filter_rows(fact, fact_key, bitmap, num_hashes)
    # frame-qualified references: fact_key and dim_key may share a name
    return pruned.join(dim, pruned[fact_key] == dim[dim_key])


def bloom_pruned_anti_join(
    batch: DataFrame,
    existing: DataFrame,
    batch_key: str,
    existing_key: str,
    fpp: float = 0.01,
    n_keys: int | None = None,
) -> DataFrame:
    """Exact left-anti join (``batch`` rows whose key is NOT in
    ``existing``) with a Bloom fast path for the common case.

    The incremental-ingest shape: dedup a new batch against a huge
    already-ingested corpus. A Bloom ``false`` is definitive — no false
    negatives — so bloom-negative rows are NEW by construction and
    bypass the join entirely (zero shuffle for, typically, the vast
    majority of an incoming batch). Only the bloom-POSITIVE sliver —
    true duplicates plus ~fpp false positives — pays the exact
    ``left_anti`` shuffle that removes the false positives. Result is
    bit-identical to the plain anti-join (oracle-checked by
    ``incremental_dedup_new_batch``).

    At 100 TB the existing side never re-shuffles: its few-MB bitmap is
    built once (driver traffic bounded by filter size, see
    :func:`build_bloom`) and can be persisted between ingests; the
    anti-join input is ~``fpp × |batch| + |dupes|`` rows.
    """
    if n_keys is None:
        n_keys = existing.select(existing_key).distinct().count()
    num_bits, num_hashes = optimal_bits(n_keys, fpp)
    bitmap = build_bloom(existing, existing_key, num_bits, num_hashes)
    flagged = batch.withColumn(
        "__maybe_dup", might_contain_col(batch, batch_key, bitmap, num_hashes)
    )
    fresh = flagged.filter(~F.col("__maybe_dup")).drop("__maybe_dup")
    maybe = flagged.filter(F.col("__maybe_dup")).drop("__maybe_dup")
    confirmed_new = maybe.join(
        existing.select(F.col(existing_key).alias(batch_key)).distinct(),
        on=batch_key,
        how="left_anti",
    )
    return fresh.unionByName(confirmed_new)
