"""Behavioral tests for the training-data curation workloads."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from big_data_pipeline_spark.workloads import training_data as td

SF_SMALL = "/root/testdata/sf0.001"


def test_kanon_group_sizes_are_true_counts(spark):
    out = td.pii_pseudonymize_kanon(spark, SF_SMALL).cache()
    # k reported on every row must equal the actual group size
    recount = out.groupBy("c_nationkey", "c_mktsegment", "bal_bucket").agg(
        F.count(F.lit(1)).alias("true_k"), F.max("k_anonymity").alias("reported_k")
    )
    assert recount.filter("true_k <> reported_k").count() == 0
    bad_flag = out.filter(
        (F.col("suppress") != (F.col("k_anonymity") < td._K_THRESHOLD))
    )
    assert bad_flag.count() == 0
    # pseudonym is a 64-hex sha256, never the raw name
    assert out.filter(~F.col("name_pseudo").rlike("^[0-9a-f]{64}$")).count() == 0


def test_gopher_stats_bounds_and_keep_consistency(spark):
    rows = td.gopher_repetition_stats(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r.n_distinct <= r.n_tokens
        assert 0.0 <= r.dup_token_frac < 1.0
        assert 0.0 < r.top_token_share <= 1.0
        assert 0.0 < r.top_bigram_share <= 1.0
        # bigrams repeat at most as sharply as their rarer constituent
        assert r.keep == (
            r.dup_token_frac <= td._DUP_FRAC_MAX
            and r.top_token_share <= td._TOP_TOKEN_MAX
        )


def test_dedup_keep_best_covers_corpus_and_picks_longest(spark):
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    kept = td.dedup_keep_best(spark, SF_SMALL).cache()
    # every source row is absorbed into exactly one group
    total = kept.agg(F.sum("group_size")).collect()[0][0]
    assert total == docs.count()
    # the kept doc is maximal-length within its fingerprint group
    joined = (
        docs.select(F.md5("text").alias("fingerprint"), "n_chars")
        .groupBy("fingerprint")
        .agg(F.max("n_chars").alias("max_chars"))
        .join(kept, "fingerprint")
    )
    assert joined.filter("n_chars <> max_chars").count() == 0


def test_source_quota_respected_and_deterministic(spark):
    a = td.source_quota_sample(spark, SF_SMALL)
    per_source = a.groupBy("source").count().collect()
    assert all(r["count"] <= td._QUOTA for r in per_source)
    b = td.source_quota_sample(spark, SF_SMALL)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_contamination_rates_bounded_and_exclude_benchmark(spark):
    out = td.contamination_ngram_overlap(spark, SF_SMALL).cache()
    assert out.filter(F.col("source") == td._BENCH_SOURCE).count() == 0
    assert out.filter(
        (F.col("contamination_rate") < 0) | (F.col("contamination_rate") > 1)
    ).count() == 0
    assert out.filter("n_hits > n_shingles").count() == 0


def test_regression_stats_match_numpy(spark):
    out = {r.l_returnflag: r for r in td.lineitem_regression_stats(spark, SF_SMALL).collect()}
    pdf = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet").select(
        "l_returnflag", "l_quantity", "l_extendedprice"
    ).toPandas()
    for flag, grp in pdf.groupby("l_returnflag"):
        x = grp["l_quantity"].to_numpy()
        y = grp["l_extendedprice"].to_numpy()
        slope, intercept = np.polyfit(x, y, 1)
        corr = np.corrcoef(x, y)[0, 1]
        r = out[flag]
        assert r.n_rows == len(grp)
        assert abs(r.slope - slope) <= 1e-6 * max(1.0, abs(slope))
        assert abs(r.intercept - intercept) <= 1e-6 * max(1.0, abs(intercept))
        assert abs(r.corr_qty_price - corr) <= 1e-9


def test_weighted_sample_is_exact_k_deterministic_and_length_biased(spark):
    a = td.weighted_sample_docs(spark, SF_SMALL).cache()
    assert a.count() == td._SAMPLE_K
    assert a.filter("rank < 1 or rank > 100").count() == 0
    b = td.weighted_sample_docs(spark, SF_SMALL)
    assert a.exceptAll(b).count() == 0
    # length-weighted keys must skew the sample toward longer docs
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    corpus_avg = docs.agg(F.avg("n_chars")).collect()[0][0]
    sample_avg = a.agg(F.avg("n_chars")).collect()[0][0]
    assert sample_avg > corpus_avg


def test_inverted_index_postings_sorted_and_capped(spark):
    from big_data_pipeline_spark.workloads import text as text_wl

    rows = text_wl.inverted_index_postings(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r.df >= 2
        postings = [int(x) for x in r.postings.split(",")]
        assert len(postings) == min(r.df, text_wl._POSTING_CAP)
        assert postings == sorted(postings)


def test_dup_span_fraction_detects_partial_copies(spark, tmp_path):
    """A doc that copies a long span from another scores dup_frac > 0 on
    exactly the copied positions; a unique doc scores 0; full duplicates
    score 1.0 on both sides."""
    from big_data_pipeline_spark.workloads import text as text_wl

    k = text_wl._SPAN_K
    span = " ".join(f"w{i}" for i in range(k + 4))  # k+4 tokens -> 5 shingles
    rows = [
        (0, span + " unique tail zero alpha beta gamma delta epsilon"),
        (1, "other prefix one two three four five six " + span),
        (2, "entirely distinct content with no shared spans at all here"),
        (3, "copy me exactly once and we both become full duplicates yes"),
        (4, "copy me exactly once and we both become full duplicates yes"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.withColumn("lang", F.lit("en")).withColumn(
        "source", F.lit("t")
    ).withColumn("n_chars", F.length("text")).write.parquet(
        str(tmp_path / "documents.parquet")
    )
    out = {
        r.doc_id: r
        for r in text_wl.dup_span_fraction(spark, str(tmp_path)).collect()
    }
    assert out[0].n_dup_spans == 5 and out[1].n_dup_spans == 5
    assert 0 < out[0].dup_frac < 1 and 0 < out[1].dup_frac < 1
    assert out[2].dup_frac == 0.0
    assert out[3].dup_frac == 1.0 and out[4].dup_frac == 1.0
    # every doc accounts for all of its shingle positions
    for r in out.values():
        n_toks = len(rows[r.doc_id][1].split())
        assert r.n_spans == max(n_toks - k + 1, 1)


def test_zscore_outliers_exceed_threshold_and_match_recompute(spark):
    from big_data_pipeline_spark.workloads import data_quality as dq

    out = dq.zscore_outlier_orders(spark, SF_SMALL).cache()
    assert out.count() > 0
    assert out.filter(F.abs(F.col("zscore")) <= dq._Z_THRESHOLD).count() == 0
    # spot-check one row against a pandas recompute (population sigma)
    pdf = spark.read.parquet(f"{SF_SMALL}/orders.parquet").toPandas()
    r = out.orderBy("o_orderkey").first()
    grp = pdf[pdf.o_orderpriority == r.o_orderpriority].o_totalprice
    z = (r.o_totalprice - grp.mean()) / grp.std(ddof=0)
    assert abs(z - r.zscore) < 1e-9


def test_incremental_dedup_matches_plain_anti_join(spark):
    out = td.incremental_dedup_new_batch(spark, SF_SMALL).cache()
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").select(
        "doc_id", "source", F.md5("text").alias("fingerprint")
    )
    existing = docs.filter(F.col("doc_id") % 5 == 0)
    batch = docs.filter(F.col("doc_id") % 5 != 0)
    # bloom fast path must be invisible: bit-identical to the plain plan
    from pyspark.sql import Window

    plain = (
        batch.join(existing.select("fingerprint"), "fingerprint", "left_anti")
        .withColumn(
            "rn",
            F.row_number().over(Window.partitionBy("fingerprint").orderBy("doc_id")),
        )
        .filter("rn = 1")
        .select("doc_id", "fingerprint", "source")
    )
    assert out.count() == plain.count()
    assert out.exceptAll(plain).count() == 0 and plain.exceptAll(out).count() == 0
    # survivors are unique by fingerprint and none exist in the corpus
    assert out.groupBy("fingerprint").count().filter("count > 1").count() == 0
    assert out.join(existing, "fingerprint", "inner").count() == 0


def test_quality_quantile_gate_keeps_top_quartile_exactly(spark):
    out = td.quality_quantile_gate(spark, SF_SMALL).cache()
    assert out.count() > 0
    # one threshold per lang, and every kept row clears it
    th = out.select("lang", "lang_p75").distinct()
    assert th.count() == out.select("lang").distinct().count()
    assert out.filter("n_tokens < lang_p75").count() == 0
    # threshold is the exact discrete p75: per lang, kept fraction is in
    # [25%, 25% + tie mass) and lowering the threshold by 1 would keep >25%
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    from big_data_pipeline_spark.functions.text import tokenize

    nt = docs.select("lang", F.size(tokenize("text")).alias("n")).toPandas()
    kept = out.groupBy("lang").count().toPandas().set_index("lang")["count"]
    for lang, grp in nt.groupby("lang"):
        n = len(grp)
        thr = int(
            th.filter(F.col("lang") == lang).collect()[0]["lang_p75"]
        )
        below = int((grp.n < thr).sum())  # strictly below threshold
        assert below * 4 < n * 3  # removing <75%: kept >= 25%
        assert int((grp.n <= thr).sum()) * 4 >= n * 3  # thr is minimal
        assert kept[lang] == int((grp.n >= thr).sum())


def test_stream_sliding_counts_each_event_twice(spark):
    from big_data_pipeline_spark.workloads import streaming_surface as ss

    out = ss.stream_sliding_window_counts(spark, SF_SMALL)
    total = out.agg(F.sum("n_events")).collect()[0][0]
    n_events = spark.read.parquet(f"{SF_SMALL}/events.parquet").count()
    assert total == 2 * n_events


def test_mixture_resample_rates_and_realized_mixture(spark):
    out = td.mixture_temperature_resample(spark, SF_SMALL).cache()
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    from big_data_pipeline_spark.functions.text import tokenize

    tok = (
        docs.select("source", F.size(tokenize("text")).alias("n"))
        .groupBy("source")
        .agg(F.sum("n").alias("tok_s"))
        .toPandas()
        .set_index("source")["tok_s"]
    )
    rates = (
        out.select("source", "accept_rate").distinct().toPandas()
        .set_index("source")["accept_rate"]
    )
    # closed form: rate_s = sqrt(tok_min / tok_s); smallest source is
    # never downsampled
    tok_min = tok.min()
    for s, r in rates.items():
        assert abs(r - np.sqrt(tok_min / tok[s])) < 1e-12
        assert 0.0 < r <= 1.0
    assert abs(rates[tok.idxmin()] - 1.0) < 1e-15
    # every source survives, no doc appears twice, output is a subset
    assert set(rates.index) == set(tok.index)
    ids = out.select("doc_id").toPandas()["doc_id"]
    assert ids.is_unique
    # realized per-source token share moves toward the alpha=0.5 target:
    # expected kept tokens ~ rate_s * tok_s = sqrt(tok_min * tok_s)
    kept = (
        out.groupBy("source").agg(F.sum("n_tokens").alias("k"))
        .toPandas().set_index("source")["k"]
    )
    for s in tok.index:
        expect = np.sqrt(float(tok_min) * float(tok[s]))
        assert abs(kept[s] - expect) / expect < 0.35  # hash-sample noise


def test_train_split_assign_partitions_every_doc_once(spark):
    out = td.train_split_assign(spark, SF_SMALL).toPandas()
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    n = docs.count()
    assert set(out["split"]) <= {"train", "val", "test"}
    assert out["n_docs"].sum() == n
    # 80/10/10 by hash: loose bounds, deterministic given the corpus
    frac = out.groupby("split")["n_docs"].sum() / n
    assert 0.7 < frac.get("train", 0) < 0.9
    assert 0.03 < frac.get("val", 0) < 0.2
    assert 0.03 < frac.get("test", 0) < 0.2
    # deterministic: a second run is identical
    again = td.train_split_assign(spark, SF_SMALL).toPandas()
    a = out.sort_values(["split", "lang"]).reset_index(drop=True)
    b = again.sort_values(["split", "lang"]).reset_index(drop=True)
    assert a.equals(b)


def test_prefix_filter_jaccard_matches_naive(spark, tmp_path):
    """The ppjoin prefix filter must lose no pair the naive all-shingles
    join finds (completeness theorem) and add none (exact verify)."""
    from big_data_pipeline_spark.workloads import text as text_wl

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (0, base + " lambda mu"),
        (1, base + " lambda nu"),        # near-dup of 0
        (2, base),                        # near-dup of both
        (3, "totally different words nothing shared with the others one"),
        (4, "short doc"),                 # single partial shingle
        (5, "short doc"),                 # exact dup of 4 (jaccard 1.0)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.withColumn("lang", F.lit("en")).withColumn(
        "source", F.lit("t")
    ).withColumn("n_chars", F.length("text")).write.parquet(
        str(tmp_path / "documents.parquet")
    )
    naive = {
        (r.doc_id1, r.doc_id2): (r.n_common, r.jaccard)
        for r in text_wl.shingle_jaccard_pairs(spark, str(tmp_path)).collect()
    }
    pref = {
        (r.doc_id1, r.doc_id2): (r.n_common, r.jaccard)
        for r in text_wl.jaccard_prefix_filter_pairs(
            spark, str(tmp_path)
        ).collect()
    }
    assert pref == naive
    assert (4, 5) in pref and pref[(4, 5)][1] == 1.0


def test_bigram_lm_quality_toy_probabilities(spark, tmp_path):
    """Hand-checked add-one smoothing: p(w2|w1) = (C(w1 w2)+1)/(C(w1 .)+V)."""
    from big_data_pipeline_spark.workloads import text as text_wl

    rows = [(0, "a b a b"), (1, "a b c")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.withColumn("lang", F.lit("en")).withColumn(
        "source", F.lit("t")
    ).withColumn("n_chars", F.length("text")).write.parquet(
        str(tmp_path / "documents.parquet")
    )
    # bigrams: doc0 = ab, ba, ab; doc1 = ab, bc
    # C(ab)=3, C(ba)=1, C(bc)=1; C(a.)=3, C(b.)=2; V={a,b,c}=3
    out = {
        r.doc_id: r
        for r in text_wl.bigram_lm_quality(spark, str(tmp_path)).collect()
    }
    p_ab = (3 + 1) / (3 + 3)
    p_ba = (1 + 1) / (2 + 3)
    p_bc = (1 + 1) / (2 + 3)
    assert out[0].n_bigrams == 3
    # avg routes through exact DECIMAL(38,6) accumulation -> 6-dp grid
    assert abs(out[0].avg_bigram_prob - (2 * p_ab + p_ba) / 3) < 1e-6
    assert out[0].min_bigram_prob == p_ba
    assert out[1].n_bigrams == 2
    assert abs(out[1].avg_bigram_prob - (p_ab + p_bc) / 2) < 1e-6


def test_prefix_filter_prunes_hot_shingle_candidates(spark, tmp_path):
    """Where prefix filtering earns its keep: a corpus whose docs all
    share a hot boilerplate block. The naive join meets every doc pair
    on every boilerplate shingle; the frequency-ordered prefix keeps
    each doc's RAREST shingles, so candidates collapse to near zero
    while the final output stays identical (completeness)."""
    from big_data_pipeline_spark.functions.text import exploded_shingles
    from big_data_pipeline_spark.workloads import text as text_wl

    boiler = " ".join(f"b{i}" for i in range(30))
    rows = [
        (i, boiler + " " + " ".join(f"u{i}_{j}" for j in range(40)))
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.withColumn("lang", F.lit("en")).withColumn(
        "source", F.lit("t")
    ).withColumn("n_chars", F.length("text")).write.parquet(
        str(tmp_path / "documents.parquet")
    )
    docs = spark.read.parquet(str(tmp_path / "documents.parquet"))
    sh = exploded_shingles(docs, "doc_id", "text", 3)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    n_cand = text_wl._prefix_candidates(
        sh, sizes, text_wl._JACCARD_THRESHOLD
    ).count()
    a, b = sh.alias("a"), sh.alias("b")
    naive_meets = a.join(
        b,
        (F.col("a.shingle") == F.col("b.shingle"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).count()
    # every pair meets on all 28 boilerplate shingles naively (~22k
    # meets); no doc's prefix reaches the hot block -> zero candidates
    assert naive_meets >= 20000
    assert n_cand == 0
    # and the two operators still agree end-to-end (no pair is >= 0.5
    # jaccard here, so both are empty)
    naive_pairs = text_wl.shingle_jaccard_pairs(spark, str(tmp_path)).count()
    pref_pairs = text_wl.jaccard_prefix_filter_pairs(
        spark, str(tmp_path)
    ).count()
    assert naive_pairs == pref_pairs == 0


def test_epoch_shuffle_is_seeded_permutation(spark, sf_dir):
    """Every doc appears once; positions within each shard are a dense
    1..n sequence; assignment is reproducible run-to-run."""
    from big_data_pipeline_spark.workloads.training_data import (
        _EPOCH_SHARDS,
        epoch_shuffle_shards,
    )

    out = epoch_shuffle_shards(spark, sf_dir).collect()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert len(out) == n_docs
    assert len({r.doc_id for r in out}) == n_docs
    by_shard: dict[int, list[int]] = {}
    for r in out:
        assert 0 <= r.shard < _EPOCH_SHARDS
        by_shard.setdefault(r.shard, []).append(r.pos_in_shard)
    for positions in by_shard.values():
        assert sorted(positions) == list(range(1, len(positions) + 1))
    again = {(r.doc_id, r.shard, r.pos_in_shard)
             for r in epoch_shuffle_shards(spark, sf_dir).collect()}
    assert again == {(r.doc_id, r.shard, r.pos_in_shard) for r in out}


def test_neardup_persisted_corpus_path_equals_self_contained(
    spark, sf_dir, tmp_path
):
    """The production path (persisted corpus shingle/size tables fed to
    neardup_batch_vs_corpus) must return exactly the pairs of the
    self-contained registry query on the same %5 split — parquet
    round-tripping the corpus side changes cost, never results."""
    from big_data_pipeline_spark.functions.text import exploded_shingles
    from big_data_pipeline_spark.workloads.training_data import (
        incremental_neardup_batch,
        neardup_batch_vs_corpus,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    corpus_sh_src = exploded_shingles(
        docs.filter(F.col("doc_id") % 5 == 0), "doc_id", "text", 3
    )
    corpus_sh_src.write.parquet(str(tmp_path / "corpus_shingles"))
    corpus_sh = spark.read.parquet(str(tmp_path / "corpus_shingles"))
    corpus_sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n")).write.parquet(
        str(tmp_path / "corpus_sizes")
    )
    corpus_sizes = spark.read.parquet(str(tmp_path / "corpus_sizes"))

    batch_sh = exploded_shingles(
        docs.filter(F.col("doc_id") % 5 != 0), "doc_id", "text", 3
    ).localCheckpoint(eager=True)
    batch_sizes = batch_sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))

    got = {
        (r.batch_id, r.corpus_id, r.n_common, round(r.jaccard, 12))
        for r in neardup_batch_vs_corpus(
            batch_sh, corpus_sh, batch_sizes, corpus_sizes
        ).collect()
    }
    want = {
        (r.batch_id, r.corpus_id, r.n_common, round(r.jaccard, 12))
        for r in incremental_neardup_batch(spark, sf_dir).collect()
    }
    assert got == want
    assert want  # split must actually produce near-dup pairs


def test_neardup_core_matches_bruteforce_at_threshold_boundary(spark):
    """Crafted corpus with pairs AT, just above, and just below the 0.5
    Jaccard threshold: the Bloom-pruned path must return exactly the
    brute-force pair set (no false negatives from the bitmap, no
    boundary drift from the n_common/(na+nb-n_common) arithmetic)."""
    from big_data_pipeline_spark.functions.text import exploded_shingles
    from big_data_pipeline_spark.workloads.training_data import (
        neardup_batch_vs_corpus,
    )

    def doc(words):
        return " ".join(words)

    base = [f"w{i}" for i in range(12)]  # 10 3-shingles
    rows = [
        # corpus docs (even ids), batch docs (odd ids)
        (0, doc(base)),
        # identical -> jaccard 1.0
        (1, doc(base)),
        # shares a 6-word prefix with doc 0: 4 common shingles,
        # 10 + 8 - 4 = 14 union -> 0.2857 (below)
        (3, doc(base[:6] + [f"x{i}" for i in range(4)])),
        # shares 9 of 12 words contiguously: 7 common, 10+10-7=13
        # -> 0.538 (above)
        (5, doc(base[:9] + ["y0", "y1", "y2"])),
        # exactly AT 0.5: 12 common shingles, 14+22-12=24 union = 0.5
        (2, doc([f"z{i}" for i in range(16)])),           # 14 shingles
        (7, doc([f"q{i}" for i in range(10)] + [f"z{i}" for i in range(14)])),
        # disjoint batch doc -> no pair
        (9, doc([f"n{i}" for i in range(12)])),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def shingles(words):
        toks = words.split()
        k = 3
        n = max(1, len(toks) - k + 1)
        return {" ".join(toks[i : i + k]) for i in range(n)}

    by_id = {i: shingles(t) for i, t in rows}
    want = set()
    for b, bs in by_id.items():
        if b % 2 == 0:
            continue
        for c, cs in by_id.items():
            if c % 2 == 1:
                continue
            inter = len(bs & cs)
            if inter and inter / len(bs | cs) >= 0.5:
                want.add((b, c, inter))

    corpus = df.filter(F.col("doc_id") % 2 == 0)
    batch = df.filter(F.col("doc_id") % 2 == 1)
    corpus_sh = exploded_shingles(corpus, "doc_id", "text", 3)
    batch_sh = exploded_shingles(batch, "doc_id", "text", 3).localCheckpoint(
        eager=True
    )
    got = {
        (r.batch_id, r.corpus_id, r.n_common)
        for r in neardup_batch_vs_corpus(
            batch_sh,
            corpus_sh,
            batch_sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n")),
            corpus_sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n")),
        ).collect()
    }
    assert got == want
    # the fixture must actually exercise all three regimes
    assert (1, 0, 10) in want          # identical pair
    assert (7, 2, 12) in want          # exactly at threshold
    assert all(b != 3 and b != 9 for b, _, _ in want)  # below + disjoint
