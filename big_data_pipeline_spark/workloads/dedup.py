"""Approximate-dedup workload: MinHash-LSH and SimHash near-dup pairs.

Both are approximate-by-construction (SURVEY.md §7.4: LSH ops can't
hash-match an oracle), so the driver records rows-only checks here.
Their quality is pinned two other ways:
- tests/test_dedup.py asserts MinHash recall == 1.0 on the corpus's
  planted near-dups vs the exact ``shingle_jaccard_pairs`` oracle query,
  and SimHash determinism across runs.
- ``minhash_dedup_pairs`` verifies every candidate with EXACT Jaccard,
  so its output is a subset of the exact query's — precision 1.0 by
  construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from big_data_pipeline_spark.dedup.minhash import minhash_dedup_pairs
from big_data_pipeline_spark.dedup.simhash import simhash_pairs
from big_data_pipeline_spark.io import read_table


def minhash_lsh_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return minhash_dedup_pairs(docs, threshold=0.5)


def simhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return simhash_pairs(docs, max_hamming=3, chunks=4)


QUERIES = {
    "minhash_lsh_dedup": minhash_lsh_dedup,
    "simhash_near_dups": simhash_near_dups,
}

ORACLE: dict[str, str] = {}
