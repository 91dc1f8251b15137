"""MinHash + LSH near-duplicate detection (shingle → minhash → band → join).

The standard large-corpus near-dedup pipeline (Broder's MinHash + the
banding construction from Leskovec/Rajaraman/Ullman, "Mining of Massive
Datasets" ch. 3):

1. 3-word shingles per document (distinct).
2. ``num_perm`` min-hashes per doc: h_i(s) = xxhash64(s || '#' || i);
   the signature column is an array built in ONE aggregation.
3. Band the signature (``bands`` x ``rows_per_band``), hash each band,
   explode → (band_id, band_hash) keys.
4. Self-join on the band key → candidate pairs (docs agreeing on any
   full band).
5. Verify candidates with EXACT shingle Jaccard — output only true
   near-dups, so precision is 1.0 and recall is the LSH knob:
   P(candidate) = 1 - (1 - j^rows)^bands.

Scale notes (100 TB):
- Everything is hash/groupBy/join — no Python, no driver state.
- The band join is an equi-join on a high-cardinality key; hot buckets
  (boilerplate shingles) are the classic skew source — AQE skew-join
  splits them. Bucket size can also be capped with a count filter
  (drop pathological buckets) without hurting recall on real pairs.
- The exact-verify join ships only candidate docs' shingle sets, not
  the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from big_data_pipeline_spark.functions.text import exploded_shingles


def minhash_signatures(
    docs: DataFrame,
    num_perm: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, signature array<long>, n_shingles) per document."""
    sh = exploded_shingles(docs, id_col, text_col, 3).withColumn(
        # hash the string once; permutations re-hash the 8-byte value
        # (64 fixed-width hashes beat 64 string concat+hash by ~2x)
        "h0",
        F.xxhash64("shingle"),
    )
    mins = [
        F.min(F.xxhash64(F.col("h0"), F.lit(i))).alias(f"h{i}")
        for i in range(num_perm)
    ]
    sig = sh.groupBy(id_col).agg(
        *mins, F.count(F.lit(1)).alias("n_shingles")
    )
    return sig.select(
        id_col,
        F.array(*[F.col(f"h{i}") for i in range(num_perm)]).alias("signature"),
        "n_shingles",
    )


def candidate_pairs(
    signatures: DataFrame,
    bands: int = 16,
    rows_per_band: int = 4,
    id_col: str = "doc_id",
    num_perm: int | None = None,
) -> DataFrame:
    """LSH banding: docs sharing any full band become a candidate pair.

    ``num_perm``, when given, guards band geometry: indexing past the
    signature yields all-NULL bands whose identical hash would make
    EVERY doc a candidate of every other (concat_ws skips nulls) — the
    exact-verify filter keeps results correct but the band join
    silently degenerates to O(n^2).
    """
    if num_perm is not None and bands * rows_per_band > num_perm:
        raise ValueError(
            f"bands*rows_per_band = {bands * rows_per_band} exceeds "
            f"num_perm = {num_perm}; shrink bands or rows_per_band"
        )
    band_hashes = F.array(
        *[
            F.xxhash64(
                F.concat_ws(
                    ",",
                    *[
                        F.col("signature")[b * rows_per_band + r].cast("string")
                        for r in range(rows_per_band)
                    ],
                )
            )
            for b in range(bands)
        ]
    )
    banded = signatures.select(
        F.col(id_col), F.posexplode(band_hashes).alias("band_id", "band_hash")
    )
    a, b = banded.alias("a"), banded.alias("b")
    return (
        # banded is O(corpus x bands) rows; never let a size
        # mis-estimate broadcast it (see shingle_jaccard_pairs note)
        a.join(
            b.hint("shuffle_hash"),
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_id1"),
            F.col(f"b.{id_col}").alias("doc_id2"),
        )
        .distinct()
    )


def minhash_dedup_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    num_perm: int = 64,
    bands: int = 16,
    rows_per_band: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Full pipeline: LSH candidates verified with exact shingle Jaccard.

    Returns (doc_id1, doc_id2, n_common, jaccard) for true near-dups the
    LSH surfaced — same schema as the exact ``shingle_jaccard_pairs``
    query, so recall is directly measurable (tests do exactly that).
    """
    # Signatures are (num_perm+2) longs per doc — compact at any corpus
    # size — and feed BOTH sides of the band self-join plus the size
    # lookup below; cut lineage so the shingle explode + num_perm-way
    # min aggregation runs exactly once (cluster equivalent: persist or
    # an intermediate table).
    sigs = minhash_signatures(docs, num_perm, id_col, text_col).localCheckpoint(
        eager=True
    )
    # Shingle-set sizes for Jaccard come from the signature pass's own
    # n_shingles — the corpus is NOT re-shingled a second time for them.
    sizes = sigs.select(
        F.col(id_col).alias("doc_id"), F.col("n_shingles").alias("n")
    )
    # The candidate PAIR LIST is metadata-sized (ids only, bounded by
    # the LSH collision count) and feeds three consumers below (the
    # intersection join plus both shingle-side prunes); materialize it
    # so the band self-join runs exactly once (r10 — before this the
    # exact-verify explode re-shingled the FULL corpus twice, once per
    # join side: guide §2.3 "shuffle keys, then move heavy bytes once").
    cands = candidate_pairs(
        sigs, bands, rows_per_band, "doc_id", num_perm=num_perm
    ).localCheckpoint(eager=True)
    # Re-shingle ONLY the docs that appear in some candidate pair: the
    # exact-verify intersection never looks at any other document, so
    # the result is unchanged while the verify-side explode drops from
    # corpus-sized to candidate-sized (the LSH prefilter's whole point).
    cand_docs = (
        cands.select(F.col("doc_id1").alias("doc_id"))
        .unionByName(cands.select(F.col("doc_id2").alias("doc_id")))
        .distinct()
    )
    sh = exploded_shingles(
        docs.select(F.col(id_col).alias("doc_id"), text_col).join(
            cand_docs, "doc_id"
        ),
        "doc_id",
        text_col,
        3,
    )

    a = sh.alias("sa")
    b = sh.alias("sb")
    inter = (
        # both shingle sides are exploded-corpus-sized: same
        # mis-estimate broadcast hazard as the band join above
        cands.join(a.hint("shuffle_hash"), F.col("doc_id1") == F.col("sa.doc_id"))
        .join(
            b.hint("shuffle_hash"),
            (F.col("doc_id2") == F.col("sb.doc_id"))
            & (F.col("sa.shingle") == F.col("sb.shingle")),
        )
        .groupBy("doc_id1", "doc_id2")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    s1, s2 = sizes.alias("s1"), sizes.alias("s2")
    jacc = F.col("n_common").cast("double") / (
        F.col("s1.n") + F.col("s2.n") - F.col("n_common")
    )
    return (
        # sizes is corpus-sized (one row per doc): no broadcast hint —
        # the optimizer broadcasts small corpora on its own, and forcing
        # it would OOM at the billion-doc scale this module targets
        inter.join(s1, F.col("doc_id1") == F.col("s1.doc_id"))
        .join(s2, F.col("doc_id2") == F.col("s2.doc_id"))
        .filter(jacc >= threshold)
        .select("doc_id1", "doc_id2", "n_common", jacc.alias("jaccard"))
    )
