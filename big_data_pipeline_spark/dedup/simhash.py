"""SimHash fingerprinting + Hamming-distance near-dup pairs.

Charikar's SimHash: each document maps to a 64-bit fingerprint whose
bits are the signs of token-hash bit-sums; near-identical documents
differ in few bits. Pair search uses the pigeonhole trick (Manku et
al., WWW'07): split 64 bits into ``chunks`` pieces — two fingerprints
within Hamming distance d must agree on at least one piece if
``chunks > d`` — so candidates come from an equi-join on (chunk_id,
chunk_value), never a quadratic scan.

Scale notes: fingerprints are 8 bytes/doc; the chunk join is 4 narrow
shuffle keys per doc. This is the cheapest near-dedup at extreme scale
(weaker than MinHash on word-level edits, far cheaper to store/join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from big_data_pipeline_spark.functions.text import exploded_shingles

BITS = 64


def simhash(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, simhash bigint) per document.

    Features are distinct 3-word shingles, not unigrams: on a
    small-vocabulary corpus every document shares most unigrams, which
    collapses unigram-SimHash distances to noise (measured: hundreds of
    random pairs at Hamming 0). Shingles are effectively doc-unique
    except for true near-duplicates, restoring the separation SimHash
    assumes. Per bit b: sum over features of +1/-1 as bit b of the
    md5-prefix feature hash is set/clear; fingerprint bit b =
    (sum >= 0).
    One explode + one groupBy; the 64 conditional sums are a single
    wide aggregate (map-side combinable).
    """
    # Feature hash = the first 64 bits of md5(shingle), carried as two
    # unsigned 32-bit halves (F.conv parses 8 hex chars exactly into a
    # long). md5 — not xxhash64 — so an independent engine can REPLAY
    # the fingerprints bit-for-bit (DuckDB has md5() but not xxhash64;
    # this is what upgrades simhash_near_dups from a rows-only driver
    # check to a cell-exact one). Distribution quality is equivalent:
    # both are uniform 64-bit mixes of the shingle bytes.
    hx = F.md5("shingle")
    toks = exploded_shingles(docs, id_col, text_col, 3).withColumns(
        {
            "h_hi": F.conv(F.substring(hx, 1, 8), 16, 10).cast("long"),
            "h_lo": F.conv(F.substring(hx, 9, 8), 16, 10).cast("long"),
        }
    )

    def _bit(b: int):
        col, shift = ("h_lo", b) if b < 32 else ("h_hi", b - 32)
        return F.shiftright(col, shift).bitwiseAND(F.lit(1))

    # Sum the raw bit (0/1) per position plus ONE shared feature count
    # instead of 64 branchy ±1 CASE sums: s_old_b = 2*s_b - n_feat
    # exactly, so the sign test becomes 2*s_b >= n_feat — identical
    # fingerprints (r10 A/B: ~5-8% off the aggregation stage, 0
    # mismatching fingerprints on the corpus), with 64 branch-free
    # buffer updates per row.
    bit_sums = [F.sum(_bit(b)).alias(f"s{b}") for b in range(BITS)]
    agg = toks.groupBy(id_col).agg(
        *bit_sums, F.count(F.lit(1)).alias("__nf")
    )
    fp = None
    for b in range(BITS):
        term = F.when(
            2 * F.col(f"s{b}") >= F.col("__nf"), F.lit(1).cast("long")
        ).otherwise(
            F.lit(0).cast("long")
        ) * F.lit(1 << b if b < 63 else -(1 << 63)).cast("long")
        fp = term if fp is None else fp + term
    return agg.select(F.col(id_col), fp.alias("simhash"))


def simhash_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    chunks: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) <= max_hamming.

    Requires chunks > max_hamming for lossless candidate generation.
    """
    if chunks <= max_hamming:
        raise ValueError("need chunks > max_hamming for pigeonhole soundness")
    # The fingerprint table feeds both sides of the self-join; without a
    # lineage cut the shingle explode + 64-way bit-sum aggregation — the
    # dominant cost — can replay per side. Fingerprints are 8 bytes/doc,
    # so materializing is near-free at any scale (measured 5.9s → ~3s at
    # sf0.1). On a cluster this would be a persist(DISK_ONLY) or an
    # intermediate table; localCheckpoint is the local[] equivalent.
    fps = simhash(docs, id_col, text_col).localCheckpoint(eager=True)
    width = BITS // chunks
    mask = (1 << width) - 1
    chunk_vals = F.array(
        *[
            F.shiftrightunsigned("simhash", i * width).bitwiseAND(F.lit(mask))
            for i in range(chunks)
        ]
    )
    chunked = fps.select(
        F.col(id_col),
        "simhash",
        F.posexplode(chunk_vals).alias("chunk_id", "chunk_val"),
    )
    a, b = chunked.alias("a"), chunked.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        # chunked is O(corpus x chunks) rows; never let a size
        # mis-estimate broadcast it (see minhash candidate_pairs note)
        a.join(
            b.hint("shuffle_hash"),
            (F.col("a.chunk_id") == F.col("b.chunk_id"))
            & (F.col("a.chunk_val") == F.col("b.chunk_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_id1"),
            F.col(f"b.{id_col}").alias("doc_id2"),
            F.col("a.simhash").alias("simhash1"),
            F.col("b.simhash").alias("simhash2"),
            ham.alias("hamming"),
        )
        # filter BEFORE distinct: hamming is computed pre-shuffle, so
        # far-apart candidate pairs never enter the dedup exchange
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
