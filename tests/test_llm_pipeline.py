"""Accuracy bounds for the approximate ops + sampling sanity."""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from big_data_pipeline_spark.io import read_table


def test_approx_distinct_within_rsd(spark, sf_dir):
    row = entrymod.queries()["approx_corpus_stats"](spark, sf_dir).first()
    li = read_table(spark, sf_dir, "lineitem")
    exact = li.select("l_orderkey").distinct().count()
    assert abs(row["approx_orders"] - exact) / exact < 0.05
    exact_median = li.agg(F.percentile("l_extendedprice", 0.5)).first()[0]
    assert abs(row["approx_median"] - exact_median) / exact_median < 0.02


def test_stratified_sample_fractions(spark, sf_dir):
    out = (
        entrymod.queries()["stratified_sample_docs"](spark, sf_dir)
        .toPandas()
        .set_index("lang")["n_sampled"]
    )
    totals = (
        read_table(spark, sf_dir, "documents")
        .groupBy("lang")
        .count()
        .toPandas()
        .set_index("lang")["count"]
    )
    fractions = {"en": 0.5, "de": 0.5, "es": 0.2, "fr": 0.2, "zh": 0.2}
    for lang, frac in fractions.items():
        if lang in totals.index and totals[lang] >= 30:
            got = out.get(lang, 0) / totals[lang]
            assert abs(got - frac) < 0.2, (lang, got, frac)


def test_llm_clean_pipeline_single_plan(spark, sf_dir):
    """The composite must stay one lazy plan (no driver materialization
    between stages) — its full lineage shows all source scans."""
    df = entrymod.queries()["llm_clean_corpus_stats"](spark, sf_dir)
    plan = df._jdf.queryExecution().toString()
    assert "documents.parquet" in plan and "embeddings.parquet" in plan
    assert df.count() > 0


def test_sketch_rollup_matches_exact_distinct(spark, sf_dir):
    """Merged daily sketches must estimate per-type distinct users
    within HLL error (lgConfigK=12 default → ~1.6% rse; generous 5%)."""
    from big_data_pipeline_spark.workloads.llm_pipeline import approx_sketch_rollup

    got = {r.event_type: r.approx_users for r in approx_sketch_rollup(spark, sf_dir).collect()}
    exact = {
        r.event_type: r.n
        for r in read_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(got) == set(exact)
    for k, e in exact.items():
        assert abs(got[k] - e) <= max(1, 0.05 * e), (k, got[k], e)


def test_bottomk_sample_deterministic_uniform(spark, sf_dir):
    from big_data_pipeline_spark.workloads.llm_pipeline import (
        sample_bottomk_docs,
    )

    a = sorted(r.doc_id for r in sample_bottomk_docs(spark, sf_dir).collect())
    b = sorted(r.doc_id for r in sample_bottomk_docs(spark, sf_dir).collect())
    assert a == b  # reproducible across runs
    assert len(a) == 100
    assert len(set(a)) == 100  # without replacement


def test_doc_pack_assign_conservation(spark, sf_dir):
    """Concat-and-split packing: every pack except a language's last
    must START inside its budget window, and total tokens are conserved."""
    from big_data_pipeline_spark.functions.text import tokenize
    from big_data_pipeline_spark.workloads.llm_pipeline import (
        _PACK_BUDGET,
        doc_pack_assign,
    )

    packs = doc_pack_assign(spark, sf_dir).collect()
    docs = read_table(spark, sf_dir, "documents").select(
        "lang", F.size(tokenize("text")).alias("n")
    )
    totals = {
        r.lang: r.total
        for r in docs.groupBy("lang").agg(F.sum("n").alias("total")).collect()
    }
    got = {}
    for r in packs:
        got[r.lang] = got.get(r.lang, 0) + r.pack_tokens
    assert got == totals  # no tokens lost or duplicated
    # pack ids are dense from 0 per language (stream split has no gaps)
    by_lang = {}
    for r in packs:
        by_lang.setdefault(r.lang, []).append(r.pack_id)
    for lang, ids in by_lang.items():
        assert sorted(ids) == list(range(len(ids))), lang
        # all but the final pack must span the full budget boundary:
        # docs assigned to pack p start in [p*B, (p+1)*B), so every
        # non-final pack's token span reaches the next boundary
        assert totals[lang] // _PACK_BUDGET <= len(ids)


def test_pack_greedy_binpack_invariants(spark, sf_dir):
    """No-split packing: capacity respected (except oversize singletons),
    deterministic, and greedy (a new pack opens only on overflow)."""
    from big_data_pipeline_spark.functions.text import tokenize
    from big_data_pipeline_spark.workloads.llm_pipeline import (
        _PACK_BUDGET,
        pack_greedy_binpack,
    )

    rows = pack_greedy_binpack(spark, sf_dir).collect()
    for r in rows:
        if r.n_docs > 1:
            assert r.pack_tokens <= _PACK_BUDGET, r
    # deterministic across runs
    again = pack_greedy_binpack(spark, sf_dir).collect()
    key = lambda r: (r.lang, r.pack_id)  # noqa: E731
    assert sorted(map(tuple, rows), key=str) == sorted(map(tuple, again), key=str)
    # greedy: consecutive packs cannot be merged — replay the sweep
    docs = sorted(
        read_table(spark, sf_dir, "documents")
        .select("doc_id", "lang", F.size(tokenize("text")).alias("n"))
        .collect(),
        key=lambda r: (r.lang, r.doc_id),
    )
    packed = {key(r): r for r in rows}
    used, pid, prev_lang = 0, 0, None
    for d in docs:
        if d.lang != prev_lang:
            used, pid, prev_lang = 0, 0, d.lang
        if used > 0 and used + d.n > _PACK_BUDGET:
            pid += 1
            used = 0
        used += d.n
        assert (d.lang, pid) in packed
    for lang in {d.lang for d in docs}:
        n_packs = sum(1 for (lg, _p) in packed if lg == lang)
        assert n_packs == 1 + max(p for (lg, p) in packed if lg == lang)


def test_length_bucket_batches_invariants(spark, sf_dir):
    from pyspark.sql import functions as F

    from big_data_pipeline_spark.workloads.llm_pipeline import (
        _BATCH_DOCS,
        length_bucket_batches,
    )

    out = length_bucket_batches(spark, sf_dir).collect()
    assert out
    by_bucket = {}
    for r in out:
        # power-of-two bucket, batches at most _BATCH_DOCS docs, waste
        # consistent with the padded size
        assert r.bucket & (r.bucket - 1) == 0
        assert 1 <= r.n_docs <= _BATCH_DOCS
        assert r.padded_tokens == r.bucket * r.n_docs
        assert abs(r.waste_frac - (1 - r.sum_tokens / r.padded_tokens)) < 1e-12
        by_bucket.setdefault(r.bucket, []).append(r)
    for bucket, rows in by_bucket.items():
        # only the LAST batch of a bucket may be short
        short = [r for r in rows if r.n_docs < _BATCH_DOCS]
        assert len(short) <= 1
        if short:
            assert short[0].batch_id == max(r.batch_id for r in rows)


def test_bpe_merge_learn_matches_independent_reference(spark, sf_dir):
    """Pin the learned merge table against an independently-coded BPE
    (collections.Counter + max), and prove the distributed round-loop
    computes the same rules as the gated driver-solve."""
    from collections import Counter

    import big_data_pipeline_spark.workloads.llm_pipeline as lp
    from big_data_pipeline_spark.io import read_table

    got = [tuple(r) for r in lp.bpe_merge_learn(spark, sf_dir).collect()]
    assert len(got) == lp._BPE_ROUNDS

    # independent reference over the same whitespace token stream
    wc = Counter()
    for row in read_table(spark, sf_dir, "documents").select("text").collect():
        for w in row.text.strip().split():
            wc[w] += 1
    seqs = {w: [*w, lp._BPE_EOW] for w in wc}
    expect = []
    for rnd in range(1, lp._BPE_ROUNDS + 1):
        pc = Counter()
        for w, syms in seqs.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += wc[w]
        (l, r), cnt = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        expect.append((rnd, l, r, l + r, cnt))
        for w in seqs:
            syms, out, i = seqs[w], [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == (l, r):
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            seqs[w] = out
    assert got == expect

    # distributed fallback path produces identical rules
    old = lp._BPE_DRIVER_MAX_VOCAB
    try:
        lp._BPE_DRIVER_MAX_VOCAB = 0
        dist = [tuple(r) for r in lp.bpe_merge_learn(spark, sf_dir).collect()]
    finally:
        lp._BPE_DRIVER_MAX_VOCAB = old
    assert dist == got


def test_bpe_oracle_sql_replays_trainer_on_adversarial_corpus():
    """The unrolled DuckDB CTE oracle (_bpe_merge_sql) must replay
    _bpe_learn_local exactly — including the spots where a naive SQL
    translation breaks: runs of a repeated symbol ('aaaa' forces the
    greedy non-overlapping merge), merged symbols that are substrings
    of other symbols ('ab' vs 'xab'), count ties resolved by byte
    order, and words shorter than one pair. Pure DuckDB + Python — no
    Spark session needed."""
    import duckdb

    import big_data_pipeline_spark.workloads.llm_pipeline as lp

    docs = [
        "aaaa aaaa aa",          # overlapping-run greedy merges
        "abab xab ab ab",        # 'ab' appears inside 'xab'
        "cd cd dc dc",           # exact-count tie -> byte-order winner
        "x",                     # single-char word: one (char, EOW) pair
        "  spaced   out  ",      # tokenizer trim/split edges
        "abab abab",
    ]
    con = duckdb.connect()
    quoted = ", ".join(
        f"({i}, '{d}')" for i, d in enumerate(docs)  # docs are quote-free
    )
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM (VALUES "
        + quoted
        + ") AS t(doc_id, text)"
    )
    got = sorted(con.execute(lp._bpe_merge_sql()).fetchall())

    wc: dict[str, int] = {}
    for d in docs:
        for w in d.strip().split():
            if w:
                wc[w] = wc.get(w, 0) + 1
    expect = sorted(
        (rnd, l, r, m, c)
        for rnd, l, r, m, c in lp._bpe_learn_local(wc, lp._BPE_ROUNDS)
    )
    assert got == expect
