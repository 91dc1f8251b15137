"""Round-6 regression pins: degenerate-document behavior.

ADVICE r5 flagged two engine-divergence traps on short docs — a
runtime crash (element_at index 0) in the bigram enumerations for
single-token docs, and the simhash oracle silently dropping <3-token
docs that Spark fingerprints. These tests pin the fixed behavior with
corpora the sf fixtures never contain.
"""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F


def _docs(spark, tmp_path, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.withColumn("lang", F.lit("en")).withColumn(
        "source", F.lit("t")
    ).withColumn("n_chars", F.length("text")).write.parquet(
        str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


def test_bigram_ops_degrade_to_empty_on_single_token_docs(spark, tmp_path):
    """sequence(1, 0) yields [1, 0] in Spark and element_at(t, 0) used
    to raise ELEMENT_AT_BY_INDEX_ZERO at runtime; the size>=2 gate must
    degrade single-token (and empty) docs to zero bigrams instead."""
    from big_data_pipeline_spark.workloads.llm_pipeline import (
        top_p_nucleus_filter,
    )
    from big_data_pipeline_spark.workloads.text import (
        bigram_lm_quality,
        bigram_pmi_collocations,
    )

    sf = _docs(
        spark,
        tmp_path,
        [(0, "solo"), (1, ""), (2, "   "), (3, "two words here now ok")],
    )
    # crash-regression: all three enumerate bigrams over this corpus
    assert top_p_nucleus_filter(spark, sf).count() == 0  # below _NUC_MIN
    assert bigram_pmi_collocations(spark, sf).count() == 0  # below min cnt
    lm = bigram_lm_quality(spark, sf).collect()
    # every doc still gets a quality row only if it HAS bigrams;
    # the degenerate docs contribute zero bigrams, never a crash
    assert {r.doc_id for r in lm} == {3}


def test_simhash_oracle_fingerprints_short_docs_like_spark(spark, tmp_path):
    """Docs with <3 tokens get ONE clipped partial shingle in Spark's
    exploded_shingles; the DuckDB replay must emit the same fingerprint
    (GREATEST clamp + clipped slice) so the Hamming pair sets agree —
    two identical 2-token docs MUST pair in both engines."""
    from big_data_pipeline_spark.workloads.dedup import (
        _simhash_sql,
        simhash_near_dups,
    )

    sf = _docs(
        spark,
        tmp_path,
        [
            (0, "alpha beta"),
            (1, "alpha beta"),  # identical 2-token docs: hamming 0
            (2, "solo"),
            (3, "solo"),  # identical 1-token docs: hamming 0
            (4, "completely different text with many tokens inside"),
        ],
    )
    got = {
        (r.doc_id1, r.doc_id2, r.hamming)
        for r in simhash_near_dups(spark, sf).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{tmp_path}/documents.parquet/*.parquet'"
    )
    want = {
        (r[0], r[1], r[4]) for r in con.execute(_simhash_sql()).fetchall()
    }
    assert (0, 1, 0) in got and (2, 3, 0) in got
    assert got == want
