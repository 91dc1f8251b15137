"""Property tests for the round-3 corpus-curation operators:
boilerplate span stripping, SemDeDup pruning, matryoshka rerank.
(Cross-engine cell-exactness is covered by the oracle sweep; these pin
the semantic invariants that survive fixture regeneration.)
"""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_pipeline_spark.workloads.similarity import (
    _K,
    _MRL_SHORTLIST,
    _PQ_CODES,
    _PQ_M,
    embedding_pq_codes,
    kmeans_assign_embeddings,
    knn_cosine_topk,
    knn_matryoshka_rerank,
    semdedup_prune,
)
from big_data_pipeline_spark.workloads.text import boilerplate_span_strip


def test_boilerplate_counts_and_text(spark, sf_dir):
    out = boilerplate_span_strip(spark, sf_dir)
    rows = out.collect()
    assert len(rows) > 0
    for r in rows:
        assert 0 <= r.n_boiler_spans <= r.n_spans
        assert abs(r.boiler_frac - r.n_boiler_spans / r.n_spans) < 1e-12
        # clean text keeps exactly the non-boiler spans' tokens
        n_clean_toks = len(r.clean_text.split()) if r.clean_text else 0
        # every span has <= _BP_W tokens; kept spans are non-empty
        assert n_clean_toks <= r.n_spans * 2
        if r.n_boiler_spans == 0:
            assert n_clean_toks > 0


def test_boilerplate_strips_corpus_frequent_spans(spark, sf_dir):
    # at least one document must actually lose a span at this fixture's
    # frequency profile (threshold tuned against it), proving the gate
    # isn't vacuously passing everything through
    out = boilerplate_span_strip(spark, sf_dir)
    assert out.filter(F.col("n_boiler_spans") > 0).count() > 0


def test_semdedup_lowest_id_survives_each_cluster(spark, sf_dir):
    pruned = semdedup_prune(spark, sf_dir)
    assign = kmeans_assign_embeddings(spark, sf_dir).select(
        "vec_id", "cluster_id"
    )
    # rows and clusters agree with the standalone assignment query
    joined = pruned.alias("p").join(
        assign.alias("a"), "vec_id"
    )
    assert joined.filter(
        F.col("p.cluster_id") != F.col("a.cluster_id")
    ).count() == 0
    # the minimum vec_id of every cluster can have no lower-id neighbor
    mins = pruned.groupBy("cluster_id").agg(F.min("vec_id").alias("vec_id"))
    assert (
        pruned.join(mins, ["cluster_id", "vec_id"])
        .filter(~F.col("kept"))
        .count()
        == 0
    )
    # every dropped row names a lower-id duplicate in the SAME cluster
    dropped = pruned.filter(~F.col("kept"))
    bad = dropped.alias("d").join(
        pruned.alias("k"), F.col("d.dup_of") == F.col("k.vec_id")
    ).filter(
        (F.col("d.cluster_id") != F.col("k.cluster_id"))
        | (F.col("d.dup_of") >= F.col("d.vec_id"))
    )
    assert bad.count() == 0


def test_pq_codes_shape_and_self_coding(spark, sf_dir):
    out = embedding_pq_codes(spark, sf_dir)
    rows = out.collect()
    assert len(rows) > 0
    per_vec: dict = {}
    for r in rows:
        assert 0 <= r.m < _PQ_M
        assert 0 <= r.code_id < _PQ_CODES
        assert r.dist_sq >= 0.0
        per_vec.setdefault(r.vec_id, set()).add(r.m)
    # long form covers every (vector, subspace) pair exactly once
    assert all(ms == set(range(_PQ_M)) for ms in per_vec.values())
    # codebook donors reconstruct themselves exactly in every subspace
    for r in rows:
        if r.vec_id < _PQ_CODES:
            assert r.dist_sq == 0.0, r


def test_matryoshka_rerank_subset_of_exact_shortlist(spark, sf_dir):
    exact = knn_cosine_topk(spark, sf_dir).select(
        "query_id", "neighbor_id", F.col("cos_sim").alias("exact_cos")
    )
    mrl = knn_matryoshka_rerank(spark, sf_dir)
    rows = mrl.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n"), F.max("pre_rank").alias("max_pre")
    )
    for r in rows.collect():
        assert r.n == _K
        assert r.max_pre <= _MRL_SHORTLIST
    # where the reranked result intersects the exact top-k, the full-dim
    # scores must agree exactly (same kernel, same association order)
    overlap = mrl.join(exact, ["query_id", "neighbor_id"])
    assert overlap.filter(
        F.abs(F.col("cos_sim") - F.col("exact_cos")) > 0
    ).count() == 0
    # recall@k of the cheap-first-stage pipeline should be high on this
    # corpus — the prefix carries most of the signal
    n_q = mrl.select("query_id").distinct().count()
    recall = overlap.count() / (n_q * _K)
    assert recall >= 0.5, recall


def test_hard_negatives_are_cross_label_topk(spark, sf_dir):
    from big_data_pipeline_spark.workloads.similarity import (
        _HN_K,
        hard_negative_mining,
    )

    out = hard_negative_mining(spark, sf_dir)
    assert out.filter(F.col("q_label") == F.col("n_label")).count() == 0
    per_q = out.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n"), F.max("rank").alias("mx")
    )
    for r in per_q.collect():
        assert r.n == _HN_K and r.mx == _HN_K


def test_contrastive_negatives_deterministic_and_bounded(spark, sf_dir):
    from big_data_pipeline_spark.workloads.similarity import (
        _NEG_K,
        contrastive_negative_pairs,
    )

    a = contrastive_negative_pairs(spark, sf_dir)
    per_anchor = a.groupBy("anchor_id").count().collect()
    assert all(1 <= r["count"] <= _NEG_K for r in per_anchor)
    # deterministic: two independent evaluations produce identical pairs
    b = contrastive_negative_pairs(spark, sf_dir)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_blocklist_filter_counts_and_gate(spark, tmp_path):
    """Planted corpus: hit counts, distinct-term counts, and the
    cross-multiplied keep gate (incl. the exact 1/12 boundary)."""
    from big_data_pipeline_spark.workloads.text import blocklist_term_filter

    sf = str(tmp_path)
    filler = " ".join(["tok"] * 11)
    docs = [
        (0, "slow slow fast", "en", "s", 14),          # 2/3 hits -> drop
        (1, filler + " extra", "en", "s", 1),          # 0 hits -> keep
        (2, "hash", "en", "s", 4),                     # 1/1 -> drop
        (3, "vector " + filler + " extra", "en", "s", 1),  # 1/13 -> keep
        (4, "vector " + filler, "en", "s", 1),         # 1/12 boundary -> drop
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{sf}/documents.parquet")

    rows = {r.doc_id: r for r in blocklist_term_filter(spark, sf).collect()}
    assert len(rows) == 5
    assert (rows[0].n_tokens, rows[0].n_hits, rows[0].n_terms_hit) == (3, 2, 1)
    assert rows[0].hit_frac == 2.0 / 3.0 and not rows[0].keep
    assert rows[1].n_hits == 0 and rows[1].keep
    assert rows[2].n_hits == 1 and not rows[2].keep
    assert rows[3].n_tokens == 13 and rows[3].keep
    assert rows[4].n_tokens == 12 and not rows[4].keep  # frac == 1/12 exactly


def test_char_diversity_degenerate_and_uniform(spark, tmp_path):
    """Simpson diversity: 0 for a one-symbol doc, 1 - 1/27 (eff size 27)
    for a doc using every alphabet symbol exactly once."""
    from big_data_pipeline_spark.workloads.text import doc_char_diversity

    sf = str(tmp_path)
    uniform = "abcdefghijklmnopqrstuvwxyz "
    spark.createDataFrame(
        [(0, "aaaa", "en", "s", 4), (1, uniform, "en", "s", 27)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{sf}/documents.parquet")

    rows = {r.doc_id: r for r in doc_char_diversity(spark, sf).collect()}
    assert rows[0].n_alpha == 4
    assert rows[0].simpson_div == 0.0 and rows[0].eff_alphabet == 1.0
    assert not rows[0].keep
    assert rows[1].n_alpha == 27
    assert rows[1].simpson_div == 1.0 - 1.0 / 27.0
    # 27 one-off p*p terms accumulate rounding; reciprocal lands a few
    # ulps off the exact 27 (identically in both engines)
    assert abs(rows[1].eff_alphabet - 27.0) < 1e-12
    assert rows[1].keep
