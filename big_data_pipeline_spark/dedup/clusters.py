"""Connected components over near-duplicate pairs: dedup clustering.

Pair finding (Jaccard / MinHash / SimHash) yields edges; the dedup
DECISION needs components — every document in a cluster except one
representative gets dropped. This is the canonical iterative-algorithm
shape Spark handles with a driver loop over lazy plans:

    label(v) <- min(label(v), min over neighbors' labels)

repeated to fixpoint. Each iteration is two shuffles (join + groupBy);
``localCheckpoint`` truncates the lineage so the plan doesn't grow with
iterations (the classic iterative-Spark trap). Iteration count is
O(graph diameter) — near-dup clusters are tiny cliques, so 2-3 rounds.

At 100 TB use the large-star/small-star optimization (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14) to cut rounds
to O(log d); the fixpoint loop here is the same skeleton.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iter: int = 20
) -> DataFrame:
    """(id, cluster_id) for every vertex in ``edges``; cluster_id is the
    minimum vertex id reachable from the vertex."""
    both = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
    )
    labels = (
        both.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        neighbor_min = (
            both.join(labels, both.b == labels.id)
            .groupBy("a")
            .agg(F.min("label").alias("nmin"))
        )
        updated = (
            labels.join(neighbor_min, labels.id == neighbor_min.a, "left")
            .select(
                "id",
                F.least(
                    F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))
                ).alias("label"),
                (
                    F.coalesce(F.col("nmin"), F.col("label")) < F.col("label")
                ).alias("changed"),
            )
            .localCheckpoint()  # cut lineage: plan size stays O(1) per round
        )
        n_changed = updated.filter("changed").count()
        labels = updated.drop("changed")
        if n_changed == 0:
            break
    return labels.select("id", F.col("label").alias("cluster_id"))


def dedup_representatives(
    docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Drop all but the minimum-id document of each near-dup cluster.

    ``pairs`` must have columns (doc_id1, doc_id2). Documents in no
    pair survive untouched.
    """
    cc = connected_components(pairs, "doc_id1", "doc_id2")
    drop = cc.filter(F.col("id") != F.col("cluster_id")).select(
        F.col("id").alias(id_col)
    )
    return docs.join(drop, id_col, "left_anti")
