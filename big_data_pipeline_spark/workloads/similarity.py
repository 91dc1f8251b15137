"""Embedding-similarity workload over the embeddings table.

``knn_cosine_topk`` (exact, oracle-checked) uses the *unrolled* 64-term
cosine expression from functions/vectors.py on both engines: fixed
association order makes the doubles bit-identical, so ranks and scores
hash-match with no rounding. ``knn_lsh_topk`` is the approximate scale
path (random-hyperplane LSH) with a rows-only driver check; its recall
against the exact baseline is asserted in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_pipeline_spark.functions.vectors import (
    EMB_DIMS_DEFAULT,
    cosine_sql,
    sq_norm_sql,
)
from big_data_pipeline_spark.io import read_table
from big_data_pipeline_spark.oracle import exact_avg, exact_avg_sql
from big_data_pipeline_spark.similarity.knn import brute_force_topk, lsh_topk

_N_QUERIES = 100
_K = 5


def knn_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    score = F.expr(cosine_sql("q_vec", "c_vec", EMB_DIMS_DEFAULT, offset=0))
    return brute_force_topk(queries, emb, k=_K, score=score)


_KNN_SQL = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS q_vec FROM embeddings
  WHERE vec_id < {_N_QUERIES}
),
c AS (SELECT vec_id AS neighbor_id, embedding AS c_vec FROM embeddings),
scored AS (
  SELECT query_id, neighbor_id,
         {cosine_sql("q_vec", "c_vec", EMB_DIMS_DEFAULT, offset=1)} AS cos_sim
  FROM q, c WHERE query_id <> neighbor_id
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, neighbor_id ASC) AS "rank"
  FROM scored
)
SELECT query_id, "rank", neighbor_id, cos_sim FROM ranked WHERE "rank" <= {_K}
"""


def embedding_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    norm = F.sqrt(F.expr(sq_norm_sql("embedding", EMB_DIMS_DEFAULT, offset=0)))
    return (
        read_table(spark, sf_dir, "embeddings")
        .withColumn("norm", norm)
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.min("norm").alias("min_norm"),
            F.max("norm").alias("max_norm"),
            exact_avg("norm", "avg_norm"),
        )
    )


_NORM_STATS_SQL = f"""
WITH t AS (
  SELECT label, sqrt({sq_norm_sql("embedding", EMB_DIMS_DEFAULT, offset=1)}) AS norm
  FROM embeddings
)
SELECT label, COUNT(*) AS n_vectors,
       MIN(norm) AS min_norm, MAX(norm) AS max_norm,
       {exact_avg_sql("norm", "avg_norm")}
FROM t GROUP BY label
"""


def knn_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k (rows-only check; recall asserted in tests).

    Bandwidth tuned for this corpus's weak-similarity regime (true
    neighbors only reach cosine ~0.45, so collision probabilities are
    low): 24 tables x 6 bits measures recall@5 ~0.7 vs the exact
    baseline. Corpora with real near-duplicates (cosine >0.9) would use
    fewer, wider tables."""
    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    return lsh_topk(queries, emb, k=_K, n_tables=24, bits=6)


QUERIES = {
    "knn_cosine_topk": knn_cosine_topk,
    "embedding_norm_stats": embedding_norm_stats,
    "knn_lsh_topk": knn_lsh_topk,
}

ORACLE = {
    "knn_cosine_topk": _KNN_SQL,
    "embedding_norm_stats": _NORM_STATS_SQL,
}
