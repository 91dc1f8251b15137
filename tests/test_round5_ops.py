"""Hand-computed goldens for the round-5 operators.

The oracle sweep proves Spark == DuckDB; these pin Spark == *the
intended math* on inputs small enough to verify by hand, so a shared
misunderstanding between query and oracle SQL cannot slip through
(the house test discipline, SURVEY.md §5).
"""

from __future__ import annotations

import datetime as dt
import math

from pyspark.sql import functions as F


def _docs(spark, tmp_path, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.withColumn("lang", F.lit("en")).withColumn(
        "source", F.lit("t")
    ).withColumn("n_chars", F.length("text")).write.parquet(
        str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


def test_span_first_occurrence_keeps_exactly_one_copy(spark, tmp_path):
    """doc0 and doc1 share their first 3-token span; doc1's copy must
    be stripped (doc0 wins on (doc_id, span_id) order) while unique
    spans survive untouched."""
    from big_data_pipeline_spark.workloads.text import (
        span_first_occurrence_dedup,
    )

    sf = _docs(
        spark,
        tmp_path,
        [
            (0, "a b c x y z"),  # spans: "a b c", "x y z"
            (1, "a b c q r s"),  # "a b c" repeated -> stripped
            (2, "q r s"),  # first occurrence is doc1's span 1
        ],
    )
    out = {
        r.doc_id: r for r in span_first_occurrence_dedup(spark, sf).collect()
    }
    assert out[0].n_spans == 2 and out[0].n_stripped == 0
    assert out[0].clean_text == "a b c x y z"
    assert out[1].n_spans == 2 and out[1].n_stripped == 1
    assert out[1].clean_text == "q r s"
    # doc2's "q r s" first occurred in doc1 (doc_id 1 < 2) -> stripped
    assert out[2].n_stripped == 1 and out[2].clean_text == ""
    # corpus-wide: every distinct span text kept exactly once
    kept_total = sum(r.n_kept for r in out.values())
    assert kept_total == 3  # "a b c", "x y z", "q r s"


def test_mann_kendall_hand_computed_with_ties(spark, tmp_path):
    """Series [1, 2, 2, 3]: S = 5 (five concordant pairs, one tie),
    tie term for t=2 is 2*1*9 = 18, Var = (4*3*13 - 18)/18 = 7.666...,
    Z = (5-1)/sqrt(Var), tau_a = 5/6."""
    from big_data_pipeline_spark.workloads.timeseries import (
        mann_kendall_trend,
    )

    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, i, base + dt.timedelta(hours=i), "view", v, "{}")
        for i, v in enumerate([1.0, 2.0, 2.0, 3.0])
    ]
    df = spark.createDataFrame(
        rows,
        "user_id long, event_id long, ts timestamp, event_type string,"
        " value double, props string",
    )
    df.write.parquet(str(tmp_path / "events.parquet"))
    r = mann_kendall_trend(spark, str(tmp_path)).collect()[0]
    assert r.n == 4 and r.s == 5
    var = (4 * 3 * 13 - 18) / 18.0
    assert r.var_s == var
    assert abs(r.z_stat - 4 / math.sqrt(var)) < 1e-12
    assert abs(r.tau_a - 5 / 6) < 1e-12


def test_top_p_nucleus_hand_computed(spark, tmp_path):
    """Context 'a' has continuations b:6, c:3, d:1 (total 10, all from
    one doc). With p=90%: keep b (0 < 9), keep c (6 < 9), drop d
    (9 !< 9) — the smallest set reaching 90% mass."""
    import big_data_pipeline_spark.workloads.llm_pipeline as lp

    text = " ".join(["a b"] * 6 + ["a c"] * 3 + ["a d"])
    # bigrams include cross-pair joins ("b a" etc); look only at w1='a'
    sf = _docs(spark, tmp_path, [(0, text)])
    old_min = lp._NUC_MIN
    try:
        lp._NUC_MIN = 1
        rows = [
            r
            for r in lp.top_p_nucleus_filter(spark, sf).collect()
            if r.w1 == "a"
        ]
    finally:
        lp._NUC_MIN = old_min
    kept = {r.w2: r for r in rows}
    assert set(kept) == {"b", "c"}
    assert kept["b"].rnk == 1 and kept["b"].cnt == 6
    assert kept["c"].rnk == 2 and kept["c"].cum == 9
    assert kept["b"].p_next == 0.6


def test_woe_hand_computed(spark, tmp_path):
    """Two categories: HI has 3 bad / 1 good, LO has 1 bad / 3 good.
    WoE(HI) = ln((3.5/5)/(1.5/5)) = ln(7/3); IV term follows."""
    from big_data_pipeline_spark.workloads.ml_prep import woe_risk_encoding

    rows = []
    key = 0
    for cat, status, n in [
        ("HI", "F", 3),
        ("HI", "O", 1),
        ("LO", "F", 1),
        ("LO", "O", 3),
    ]:
        for _ in range(n):
            rows.append((key, cat, status, 100.0, dt.date(2024, 1, 1)))
            key += 1
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_orderpriority string, o_orderstatus string,"
        " o_totalprice double, o_orderdate date",
    )
    df.write.parquet(str(tmp_path / "orders.parquet"))
    out = {
        r.o_orderpriority: r
        for r in woe_risk_encoding(spark, str(tmp_path)).collect()
    }
    woe_hi = math.log((3.5 / 5.0) / (1.5 / 5.0))
    assert out["HI"].n_bad == 3 and out["HI"].n_good == 1
    assert out["HI"].woe_micro == round(woe_hi * 1_000_000)
    assert abs(
        out["HI"].iv_term
        - (3.5 / 5.0 - 1.5 / 5.0) * (out["HI"].woe_micro / 1e6)
    ) < 1e-12
    # symmetry: LO's WoE is the negation on this balanced design
    assert out["LO"].woe_micro == -out["HI"].woe_micro


def test_delta_encode_varint_widths(spark, tmp_path):
    """Gaps of 100s (zigzag 2e8 -> 5 bytes) and 1s (2e6 -> 4 bytes);
    first event costs the full 8 raw bytes."""
    from big_data_pipeline_spark.workloads.events import delta_encode_events

    base = dt.datetime(2024, 1, 1)
    offsets = [0, 100, 101, 201]  # seconds
    rows = [
        (1, i, base + dt.timedelta(seconds=s), "view", 1.0, "{}")
        for i, s in enumerate(offsets)
    ]
    df = spark.createDataFrame(
        rows,
        "user_id long, event_id long, ts timestamp, event_type string,"
        " value double, props string",
    )
    df.write.parquet(str(tmp_path / "events.parquet"))
    r = delta_encode_events(spark, str(tmp_path)).collect()[0]
    assert r.n_events == 4 and r.raw_bytes == 32
    # deltas in micros: 1e8 (zz 2e8 < 128^4=2.68e8 -> 4 bytes),
    # 1e6 (zz 2e6 < 128^3=2.097e6 -> 3 bytes), 1e8 -> 4 bytes;
    # + 8 for the first event
    assert r.delta_bytes == 8 + 4 + 3 + 4
    assert r.compression_ratio == 19 / 32


def test_ndcg_perfect_when_prefix_equals_full(spark, tmp_path):
    """Vectors whose signal lives entirely in the prefix dims: the
    prefix ranking equals the full ranking, so every query's nDCG is
    exactly 1.0 and the overlap is the full top-K."""
    import numpy as np

    import big_data_pipeline_spark.workloads.similarity as sim

    rng = np.random.default_rng(3)
    n, dims = 40, 64
    vecs = []
    for i in range(n):
        v = np.zeros(dims)
        v[: sim._NDCG_DIMS] = rng.normal(size=sim._NDCG_DIMS)
        vecs.append((i, [float(x) for x in v]))
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    df.write.parquet(str(tmp_path / "embeddings.parquet"))
    out = sim.ndcg_matryoshka_prefix(spark, str(tmp_path)).collect()
    assert len(out) == sim._N_QUERIES if n >= sim._N_QUERIES else len(out) == n
    for r in out:
        assert r.n_overlap == sim._NDCG_K
        # gains are rounded onto the DECIMAL(38,6) grid while the IDCG
        # constant is full-precision: 1e-6-scale slack is expected
        assert abs(r.ndcg - 1.0) < 1e-5


def test_topm_sparsify_keeps_largest_magnitudes(spark, tmp_path):
    import big_data_pipeline_spark.workloads.similarity as sim

    vec = [0.0] * 64
    vec[4] = -9.0
    vec[10] = 5.0
    vec[63] = 1.0
    df = spark.createDataFrame(
        [(0, [float(x) for x in vec])], "vec_id long, embedding array<float>"
    )
    df.write.parquet(str(tmp_path / "embeddings.parquet"))
    out = sim.embedding_topm_sparsify(spark, str(tmp_path)).collect()
    assert len(out) == sim._SPARSIFY_M
    by_rank = {r.rank: r for r in out}
    assert by_rank[1].dim == 5 and by_rank[1].val == -9.0
    assert by_rank[2].dim == 11 and by_rank[2].val == 5.0
    assert by_rank[3].dim == 64 and by_rank[3].val == 1.0
    # remaining ranks are zero-fill ties broken by dim ascending
    assert by_rank[4].dim == 1 and by_rank[4].val == 0.0


def test_coverage_curve_hand_computed(spark, tmp_path):
    """Frequencies a:6 b:3 c:1 (total 10): 50% needs {a}, 90% needs
    {a,b}, 99% needs all three."""
    from big_data_pipeline_spark.workloads.text import ngram_coverage_curve

    sf = _docs(spark, tmp_path, [(0, " ".join(["a"] * 6 + ["b"] * 3 + ["c"]))])
    out = {
        r.threshold_pct: r for r in ngram_coverage_curve(spark, sf).collect()
    }
    assert out[50].vocab_size == 1 and out[50].covered_tokens == 6
    assert out[90].vocab_size == 2 and out[90].covered_tokens == 9
    assert out[99].vocab_size == 3 and out[99].covered_tokens == 10
    assert out[99].total_tokens == 10


def test_kl_divergence_zero_for_identical_sources(spark, tmp_path):
    """Two sources with identical token distributions: every per-type
    log ratio is ln(1) = 0, so KL is exactly 0 for both."""
    from big_data_pipeline_spark.workloads.text import (
        source_token_kl_divergence,
    )

    rows = [(0, "a a b"), (1, "a a b")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.withColumn("lang", F.lit("en")).withColumn(
        "source", F.concat(F.lit("src"), F.col("doc_id").cast("string"))
    ).withColumn("n_chars", F.length("text")).write.parquet(
        str(tmp_path / "documents.parquet")
    )
    out = source_token_kl_divergence(spark, str(tmp_path)).collect()
    assert len(out) == 2
    for r in out:
        assert r.kl_nats == 0.0 and r.n_tokens == 3


def test_pmi_hand_computed(spark, tmp_path):
    """One repeated bigram dominates: corpus '<x y>' * 30 gives
    c(x,y)=30-ish among cross pairs; check the PMI formula on the
    top collocation."""
    import big_data_pipeline_spark.workloads.text as t

    sf = _docs(spark, tmp_path, [(0, " ".join(["x y"] * 30))])
    rows = {(r.w1, r.w2): r for r in t.bigram_pmi_collocations(spark, sf).collect()}
    # bigrams: (x,y) x30, (y,x) x29 -> N=59; marginals c(x,.)=30,
    # c(.,y)=30, c(y,.)=29, c(.,x)=29
    assert set(rows) == {("x", "y"), ("y", "x")}
    xy = rows[("x", "y")]
    assert xy.c12 == 30 and xy.c1 == 30 and xy.c2 == 30
    assert xy.pmi_micro == round(math.log(30 * 59 / (30 * 30)) * 1_000_000)
    yx = rows[("y", "x")]
    assert yx.c12 == 29 and yx.c1 == 29 and yx.c2 == 29
    assert yx.pmi_micro == round(math.log(29 * 59 / (29 * 29)) * 1_000_000)


def test_hill_tail_index_hand_computed(spark, tmp_path):
    """Exact Pareto(alpha=2) order statistics: x_i = (k/i)^(1/2) * xk
    gives 1/alpha = mean of ln ratios; verify the estimator recovers
    the micro-log-rounded sum."""
    import big_data_pipeline_spark.workloads.data_quality as dq

    k = dq._HILL_K
    prices = [(100.0 * math.sqrt(k / i)) for i in range(1, k + 1)]
    rows = [
        (i, "P", prices[i - 1] if i <= k else 1.0)
        for i in range(1, k + 51)
    ]
    df = spark.createDataFrame(
        rows, "o_orderkey long, o_orderpriority string, o_totalprice double"
    ).withColumn("o_orderstatus", F.lit("O")).withColumn(
        "o_orderdate", F.lit(dt.date(2024, 1, 1))
    )
    df.write.parquet(str(tmp_path / "orders.parquet"))
    r = dq.hill_tail_index(spark, str(tmp_path)).collect()[0]
    assert r.k == k
    expect_sum = sum(
        round(math.log(p / prices[k - 1]) * 1_000_000) for p in prices
    )
    assert abs(r.inv_alpha - expect_sum / ((k - 1) * 1e6)) < 1e-12
    # Pareto(2) sample: estimator lands near 1/alpha = 0.5
    assert 0.45 < r.inv_alpha < 0.56


def test_reciprocal_best_match_mutuality(spark, sf_dir):
    """Every emitted pair must be MUTUAL top-1 under exact cosine —
    recompute directed best matches independently and compare."""
    import big_data_pipeline_spark.workloads.similarity as sim
    from big_data_pipeline_spark.functions.vectors import (
        EMB_DIMS_DEFAULT,
        cosine_sql,
    )
    from big_data_pipeline_spark.io import read_table

    emb = read_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < sim._RBM_N
    )
    a = emb.selectExpr("vec_id AS src", "embedding AS a_vec")
    b = emb.selectExpr("vec_id AS dst", "embedding AS b_vec")
    pairs = (
        a.join(b, F.col("src") != F.col("dst"))
        .withColumn(
            "cos", F.expr(cosine_sql("a_vec", "b_vec", EMB_DIMS_DEFAULT, 0))
        )
        .select("src", "dst", "cos")
        .collect()
    )
    best: dict = {}
    for r in pairs:
        cur = best.get(r.src)
        if cur is None or (r.cos, -r.dst) > (cur[1], -cur[0]):
            best[r.src] = (r.dst, r.cos)
    expect = {
        (s, d[0])
        for s, d in best.items()
        if best.get(d[0], (None,))[0] == s and s < d[0]
    }
    got = {
        (r.vec_a, r.vec_b)
        for r in sim.reciprocal_best_match(spark, sf_dir).collect()
    }
    assert got == expect and len(got) > 0


def test_dau_mau_hand_computed(spark, tmp_path):
    """Two days: day1 actives {1,2}, day2 actives {2,3} -> avg DAU 2,
    MAU 3, stickiness 2/3."""
    import datetime as dt

    rows = [
        (1, 10, dt.datetime(2024, 1, 1, 9), "view", 1.0, "{}"),
        (2, 11, dt.datetime(2024, 1, 1, 10), "view", 1.0, "{}"),
        (2, 12, dt.datetime(2024, 1, 2, 9), "view", 1.0, "{}"),
        (3, 13, dt.datetime(2024, 1, 2, 10), "view", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "user_id long, event_id long, ts timestamp, event_type string,"
        " value double, props string",
    )
    df.write.parquet(str(tmp_path / "events.parquet"))
    from big_data_pipeline_spark.workloads.behavior import dau_mau_stickiness

    r = dau_mau_stickiness(spark, str(tmp_path)).collect()[0]
    assert r.n_days == 2 and r.mau == 3
    assert r.avg_dau == 2.0 and r.stickiness == 2.0 / 3.0


def test_theil_decomposition_hand_computed(spark, tmp_path):
    """Within-equal groups: each nation's members earn the same, so
    T_within = 0 and T_total == T_between = sum (S_g/S) ln(mu_g/mu)."""
    import datetime as dt
    import math

    # nation 0: two customers earning 100; nation 1: two earning 300
    cust = spark.createDataFrame(
        [(i, i % 2) for i in range(4)], "c_custkey long, c_nationkey long"
    )
    cust.withColumn("c_name", F.concat(F.lit("c"), F.col("c_custkey"))).write.parquet(
        str(tmp_path / "customer.parquet")
    )
    spark.createDataFrame(
        [(0, "A"), (1, "B")], "n_nationkey long, n_name string"
    ).write.parquet(str(tmp_path / "nation.parquet"))
    orders = [
        (k, k, "P", 100.0 if k % 2 == 0 else 300.0, dt.date(2024, 1, 1))
        for k in range(4)
    ]
    spark.createDataFrame(
        orders,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate date",
    ).write.parquet(str(tmp_path / "orders.parquet"))
    from big_data_pipeline_spark.workloads.relational import (
        theil_inequality_decomposition,
    )

    r = theil_inequality_decomposition(spark, str(tmp_path)).collect()[0]
    assert r.n_orders == 4 and r.n_groups == 2
    # mu = 200; T = (1/(N mu)) sum x ln(x/mu), micro-log grid
    mt = lambda x: round(math.log(x / 200.0) * 1e6)  # noqa: E731
    want_total = (2 * 10000 * mt(100) + 2 * 30000 * mt(300)) / (80000 * 1e6)
    assert r.theil_total == want_total
    assert r.theil_between == want_total
    assert r.theil_within == 0.0


def test_lmoments_uniform_hand_computed(spark, tmp_path):
    """x = 1..5 (in dollars): b0=3, b1=(2+2*3+3*4+4*5)/20? — use the
    direct PWM formulas and symmetry: a symmetric sample has
    L-skewness exactly 0."""
    import datetime as dt

    rows = [
        (k, "P", float(k), "O", dt.date(2024, 1, 1)) for k in range(1, 6)
    ]
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_orderpriority string, o_totalprice double,"
        " o_orderstatus string, o_orderdate date",
    )
    df.write.parquet(str(tmp_path / "orders.parquet"))
    from big_data_pipeline_spark.workloads.advanced import (
        lmoments_by_priority,
    )

    r = lmoments_by_priority(spark, str(tmp_path)).collect()[0]
    assert r.n_orders == 5
    assert r.l1 == 3.0  # mean
    # b1 = sum x_(r)(r-1)/(n(n-1)) over cents; l2 = 2 b1 - b0
    cents = [100, 200, 300, 400, 500]
    b0 = sum(cents) / 5
    b1 = sum(c * r for c, r in zip(cents, range(0, 5))) / (5 * 4)
    b2 = sum(
        c * r * (r - 1) for c, r in zip(cents, range(0, 5))
    ) / (5 * 4 * 3)
    assert r.l2 == (2 * b1 - b0) / 100
    # symmetric sample: tau3 = 0
    assert abs((6 * b2 - 6 * b1 + b0) / (2 * b1 - b0)) < 1e-12
    assert abs(r.t3_lskewness) < 1e-12


def test_assortativity_star_graph_is_minus_one(spark):
    """A pure hub-and-spoke degree sequence has assortativity exactly
    -1; verify on the moment formula via the module's own aggregation
    by monkey-feeding a star edge set."""
    from big_data_pipeline_spark.workloads import graph_rank as gr

    # five heavy hub->spoke edges survive the 1.8x-mean strong-edge
    # gate; twenty light decoys drag the mean down and get dropped
    star = spark.createDataFrame(
        [("HUB", f"s{i}", 100.0) for i in range(5)]
        + [(f"x{i}", f"y{i}", 1.0) for i in range(20)],
        "src string, dst string, revenue double",
    )
    orig = gr.trade_edges
    try:
        gr.trade_edges = lambda *_: star
        r = gr.degree_assortativity_trade(None, "unused").collect()[0]
    finally:
        gr.trade_edges = orig
    assert r.n_edges == 5
    assert abs(r.assortativity - (-1.0)) < 1e-12
