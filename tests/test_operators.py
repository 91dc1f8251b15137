"""Semantics tests for the custom time-series operators."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from big_data_pipeline_spark.operators import asof_join, range_join_binned


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 12, minute, 0)


def test_asof_join_backward_inclusive(spark):
    quotes = spark.createDataFrame(
        [("A", _ts(0), 10.0), ("A", _ts(10), 11.0), ("B", _ts(5), 20.0)],
        ["sym", "qts", "price"],
    ).select("sym", "qts", F.col("price").alias("quote_price"))
    trades = spark.createDataFrame(
        [
            ("A", _ts(0), 1),   # equal ts → inclusive match (10.0)
            ("A", _ts(9), 2),   # between quotes → 10.0
            ("A", _ts(15), 3),  # after second quote → 11.0
            ("B", _ts(4), 4),   # before any B quote → null
            ("C", _ts(1), 5),   # key with no quotes → null
        ],
        ["sym", "tts", "trade_id"],
    )
    out = asof_join(
        trades,
        quotes,
        on=["sym"],
        left_ts="tts",
        right_ts="qts",
        value_cols=["quote_price"],
    ).toPandas().set_index("trade_id")["quote_price"]
    assert out[1] == 10.0
    assert out[2] == 10.0
    assert out[3] == 11.0
    assert out[4] != out[4] or out[4] is None  # NaN/None
    assert out[5] != out[5] or out[5] is None
    assert len(out) == 5  # left join: every trade kept


def test_asof_join_tolerance_expires_old_matches(spark):
    quotes = spark.createDataFrame(
        [("A", _ts(0), 10.0)], ["sym", "qts", "price"]
    ).select("sym", "qts", F.col("price").alias("quote_price"))
    trades = spark.createDataFrame(
        [("A", _ts(2), 1), ("A", _ts(30), 2)], ["sym", "tts", "trade_id"]
    )
    out = asof_join(
        trades,
        quotes,
        on=["sym"],
        left_ts="tts",
        right_ts="qts",
        value_cols=["quote_price"],
        tolerance=F.expr("INTERVAL 5 MINUTES"),
    ).toPandas().set_index("trade_id")["quote_price"]
    assert out[1] == 10.0
    assert out[2] != out[2]  # match older than tolerance → NaN


def test_range_join_binned_matches_naive(spark):
    import random

    rng = random.Random(7)
    left = spark.createDataFrame(
        [(i, _ts(0) + dt.timedelta(seconds=rng.randrange(0, 3600))) for i in range(80)],
        ["lid", "lts"],
    )
    right = spark.createDataFrame(
        [(j, _ts(0) + dt.timedelta(seconds=rng.randrange(0, 3600))) for j in range(80)],
        ["rid", "rts"],
    )
    got = (
        range_join_binned(left, right, "lts", "rts", lower_sec=60, upper_sec=300)
        .select("lid", "rid")
        .toPandas()
    )
    naive = (
        left.crossJoin(right)
        .filter(
            (F.unix_micros("rts") >= F.unix_micros("lts") + 60 * 1_000_000)
            & (F.unix_micros("rts") < F.unix_micros("lts") + 300 * 1_000_000)
        )
        .select("lid", "rid")
        .toPandas()
    )
    key = lambda df: sorted(map(tuple, df.to_numpy().tolist()))  # noqa: E731
    assert key(got) == key(naive)
    assert len(got) > 0


def test_range_join_no_duplicate_pairs_across_bins(spark):
    # band wider than bin: left explodes to several bins — each
    # qualifying pair must still appear exactly once
    left = spark.createDataFrame([(1, _ts(0))], ["lid", "lts"])
    right = spark.createDataFrame(
        [(j, _ts(0) + dt.timedelta(seconds=30 * j)) for j in range(20)],
        ["rid", "rts"],
    )
    got = range_join_binned(
        left, right, "lts", "rts", lower_sec=0, upper_sec=600, bin_sec=60
    ).toPandas()
    assert len(got) == len(got.drop_duplicates(["lid", "rid"]))
    assert len(got) == 20  # 0..570s all inside [0, 600)


def test_asof_tolerance_uses_matched_rows_timestamp(spark):
    """Regression: a newer right ROW with a NULL value must not let a
    stale older value slip past the tolerance window — the matched row
    (NULLs and all) is what gets attached, like native ASOF."""
    from datetime import datetime

    from big_data_pipeline_spark.operators import asof_join

    right = spark.createDataFrame(
        [
            ("A", datetime(2024, 1, 1, 12, 0), 10.0),
            ("A", datetime(2024, 1, 1, 12, 28), None),
        ],
        "k string, rts timestamp, quote double",
    )
    left = spark.createDataFrame(
        [("A", datetime(2024, 1, 1, 12, 30))], "k string, lts timestamp"
    )
    got = asof_join(
        left, right, on=["k"], left_ts="lts", right_ts="rts",
        value_cols=["quote"], tolerance=F.expr("INTERVAL 5 MINUTES"),
    ).collect()[0]
    # the matched row IS the 12:28 one (inside tolerance) — its NULL
    # value is attached; the 30-minute-old 10.0 must not leak through
    assert got.quote is None

    no_tol = asof_join(
        left, right, on=["k"], left_ts="lts", right_ts="rts",
        value_cols=["quote"],
    ).collect()[0]
    assert no_tol.quote is None  # row semantics without tolerance too


def test_salted_count_skips_nulls_like_unsalted(spark):
    """Regression: ('count', col) must count non-null values, matching
    the unsalted plan bit-for-bit; ('count', '*') counts rows."""
    from big_data_pipeline_spark.operators.skew import salted_aggregate

    df = spark.createDataFrame(
        [("a", 1.0), ("a", None), ("a", 3.0), ("b", None)],
        "k string, v double",
    )
    got = {
        r.k: (r.n_rows, r.n_vals)
        for r in salted_aggregate(
            df, ["k"], {"n_rows": ("count", "*"), "n_vals": ("count", "v")}
        ).collect()
    }
    assert got == {"a": (3, 2), "b": (1, 0)}


def test_bloom_prune_keeps_all_matches_and_prunes(spark):
    """No false negatives ever; with a selective dim the prune must
    actually drop most fact rows (that's its reason to exist)."""
    from big_data_pipeline_spark.operators.bloom import (
        bloom_filter_rows,
        bloom_pruned_join,
        build_bloom,
        optimal_bits,
    )

    fact = spark.range(0, 10_000).withColumnRenamed("id", "fk")
    dim = (
        spark.range(0, 10_000, 100)  # 100 of 10k keys survive "the filter"
        .withColumnRenamed("id", "dk")
    )
    num_bits, num_hashes = optimal_bits(100, fpp=0.01)
    bitmap = build_bloom(dim, "dk", num_bits, num_hashes)
    pruned = bloom_filter_rows(fact, "fk", bitmap, num_hashes)

    kept = {r.fk for r in pruned.collect()}
    assert set(range(0, 10_000, 100)) <= kept  # every true match survives
    assert len(kept) < 1_000  # ≥90% of non-matches pruned at fpp=1%

    joined = bloom_pruned_join(fact, dim, "fk", "dk")
    assert joined.count() == 100  # exact join result, bloom invisible


def test_bloom_sizing_monotonic():
    from big_data_pipeline_spark.operators.bloom import optimal_bits

    m1, k1 = optimal_bits(1_000, fpp=0.01)
    m2, _ = optimal_bits(1_000, fpp=0.001)
    assert m2 > m1 and m1 % 64 == 0 and 1 <= k1 <= 16


def test_sessionize_carries_state_across_arrow_batches(spark):
    """Force 3-row Arrow batches so one user's rows span batches: the
    carried (user, ts, session) state must resume counters exactly."""
    from datetime import datetime, timedelta

    from big_data_pipeline_spark.operators.secondary_sort import sessionize

    t0 = datetime(2024, 1, 1)
    rows = []
    # user 1: sessions (0s,10s) (2000s,2100s) (4000s) -> ids 1,1,2,2,3
    for i, off in enumerate([0, 10, 2000, 2100, 4000]):
        rows.append((1, i, t0 + timedelta(seconds=off)))
    # user 2: 1801s gap is > 1800 -> new session
    rows.append((2, 10, t0))
    rows.append((2, 11, t0 + timedelta(seconds=1801)))
    # user 3: exactly 1800s gap stays in session 1
    rows.append((3, 20, t0))
    rows.append((3, 21, t0 + timedelta(seconds=1800)))
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp"
    )

    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "3")
    try:
        got = {
            (r.user_id, r.event_id): r.session_id
            for r in sessionize(df).collect()
        }
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)

    assert got == {
        (1, 0): 1, (1, 1): 1, (1, 2): 2, (1, 3): 2, (1, 4): 3,
        (2, 10): 1, (2, 11): 2,
        (3, 20): 1, (3, 21): 1,
    }


def test_bloom_pruned_join_same_key_name(spark):
    """Regression: same-named join keys must not raise
    AMBIGUOUS_REFERENCE (frame-qualified references in the final join)."""
    from big_data_pipeline_spark.operators.bloom import bloom_pruned_join

    fact = spark.range(0, 1000).withColumnRenamed("id", "k")
    dim = spark.range(0, 1000, 50).withColumnRenamed("id", "k")
    assert bloom_pruned_join(fact, dim, "k", "k").count() == 20


def test_sessionize_null_user_forms_one_group(spark):
    """Regression: NULL user_ids must sessionize as ONE group (SQL
    GROUP BY/window semantics), not emit NULL session ids — NaN from
    the Arrow nullable-long conversion used to poison the equality."""
    from datetime import datetime, timedelta

    from big_data_pipeline_spark.operators.secondary_sort import sessionize

    t0 = datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [
            (None, 1, t0),
            (None, 2, t0 + timedelta(seconds=10)),
            (None, 3, t0 + timedelta(seconds=4000)),
            (7, 4, t0),
        ],
        "user_id long, event_id long, ts timestamp",
    )
    got = {r.event_id: r.session_id for r in sessionize(df).collect()}
    assert got == {1: 1, 2: 1, 3: 2, 4: 1}


def test_snapshot_diff_classifies_and_drops_noops(spark):
    from big_data_pipeline_spark.operators.cdc import snapshot_diff

    before = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", None), (None, "x", 1.0)],
        "k long, s string, v double",
    )
    after = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 25.0), (3, "c", 30.0), (4, "d", 40.0),
         (None, "y", 2.0)],
        "k long, s string, v double",
    )
    rows = snapshot_diff(before, after, keys=["k"]).collect()
    by_op = {}
    for r in rows:
        by_op.setdefault(r.op, []).append(r)

    # k=1 unchanged -> absent; k=2 value change; k=3 NULL->value change
    assert sorted(r.k for r in by_op["U"]) == [2, 3]
    assert {r.k for r in by_op["I"]} == {4, None}  # NULL key never matches
    assert [r.k for r in by_op["D"]] == [None]
    u2 = next(r for r in by_op["U"] if r.k == 2)
    assert (u2.v_before, u2.v_after) == (20.0, 25.0)


def test_sharded_running_sum_equals_window(spark, sf_dir):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from big_data_pipeline_spark.io import read_table
    from big_data_pipeline_spark.operators.prefix import sharded_running_sum

    ev = read_table(spark, sf_dir, "events").select(
        "event_id", "user_id", (F.col("event_id") % 7).alias("v")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = ev.withColumn("cum", F.sum("v").over(w))
    for shards in (1, 4, 32):
        got = sharded_running_sum(
            ev, ["user_id"], "event_id", "v", "cum", shards=shards
        )
        a = sorted(map(tuple, got.select("event_id", "cum").collect()))
        b = sorted(map(tuple, want.select("event_id", "cum").collect()))
        assert a == b, shards


def test_sharded_running_sums_multi_value_equals_windows(spark, sf_dir):
    """The multi-value form (one approxQuantile + one local window for
    ANY number of cumulative columns) must equal per-column windows —
    pins the r6 pareto/ks_drift single-pass rewrite."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from big_data_pipeline_spark.io import read_table
    from big_data_pipeline_spark.operators.prefix import (
        sharded_running_sums,
    )

    ev = read_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        (F.col("event_id") % 7).alias("v"),
        (F.col("event_id") % 3).alias("u"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = ev.withColumns(
        {
            "cum_v": F.sum("v").over(w),
            "cum_u": F.sum("u").over(w),
            "rank": F.sum(F.lit(1)).over(w),
        }
    )
    got = sharded_running_sums(
        ev,
        ["user_id"],
        "event_id",
        [("v", "cum_v"), ("u", "cum_u"), (F.lit(1), "rank")],
        shards=8,
    )
    cols = ["event_id", "cum_v", "cum_u", "rank"]
    a = sorted(map(tuple, got.select(*cols).collect()))
    b = sorted(map(tuple, want.select(*cols).collect()))
    assert a == b


def test_sharded_running_sum_low_cardinality_partition(spark, sf_dir):
    """The motivating case: ONE window partition, shards-way parallel."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from big_data_pipeline_spark.io import read_table
    from big_data_pipeline_spark.operators.prefix import sharded_running_sum

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", F.lit("all").alias("g"), F.length("text").alias("n")
    )
    w = (
        Window.partitionBy("g")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = sorted(
        map(tuple, docs.withColumn("cum", F.sum("n").over(w))
            .select("doc_id", "cum").collect())
    )
    got = sorted(
        map(tuple, sharded_running_sum(docs, ["g"], "doc_id", "n", "cum", 8)
            .select("doc_id", "cum").collect())
    )
    assert got == want


def test_sharded_running_sum_null_order_rows_kept(spark):
    """NULL order values must not be dropped by the shard equi-join:
    they land in shard 0 (the window's NULLS FIRST position) and the
    result matches the plain window for every shard count."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from big_data_pipeline_spark.operators.prefix import sharded_running_sum

    rows = [(None, 1, "a"), (None, 2, "b"), *[(i, 1, f"r{i}") for i in range(1, 41)]]
    df = spark.createDataFrame(rows, "o int, v int, tb string")
    w = (
        Window.partitionBy()
        .orderBy("o", "tb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = sorted(
        map(tuple, df.withColumn("cum", F.sum("v").over(w))
            .select("tb", "cum").collect())
    )
    for shards in (1, 4, 16):
        got = sorted(
            map(
                tuple,
                sharded_running_sum(
                    df, [], "o", "v", "cum", shards=shards, tiebreak_cols=["tb"]
                ).select("tb", "cum").collect(),
            )
        )
        assert got == want, shards


def test_cusum_changepoint_finds_step(spark, tmp_path):
    """A flat series with one level shift: the CUSUM argmax must land
    exactly on the last pre-shift event."""
    import datetime as dt

    from big_data_pipeline_spark.workloads.timeseries import (
        cusum_changepoint_per_user,
    )

    base = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(40):
        val = 1.0 if i < 25 else 9.0
        rows.append((i, base + dt.timedelta(minutes=i), 7, "m", val, "{}"))
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(str(tmp_path / "events.parquet"))
    out = cusum_changepoint_per_user(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    # deviation |S_i - i/n*S_n| peaks at the boundary (event_id 24)
    assert r.change_event_id == 24
    assert r.n_events == 40
    assert r.max_cusum_dev > 0


def test_flesch_readability_hand_counts(spark, tmp_path):
    from big_data_pipeline_spark.workloads.text import flesch_readability

    rows = [
        (0, "The cat sat. The dog ran!"),   # 6 words, 2 sentences, 6 syl
        (1, "no punctuation here"),          # sentences floored at 1
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.selectExpr(
        "doc_id", "text", "'en' AS lang", "'t' AS source",
        "CAST(length(text) AS BIGINT) AS n_chars",
    ).write.parquet(str(tmp_path / "documents.parquet"))
    out = {r.doc_id: r for r in flesch_readability(spark, str(tmp_path)).collect()}
    r0 = out[0]
    assert (r0.words, r0.sentences) == (6, 2)
    # vowel groups: e/a/a/e/o/a -> 6 ("The"=1, "cat"=1, "sat"=1, ...)
    assert r0.syllables == 6
    want = 206.835 - 1.015 * (6 / 2) - 84.6 * (6 / 6)
    assert abs(r0.flesch - want) < 1e-12
    assert out[1].sentences == 1


def test_table_profile_summary_shape(spark, sf_dir):
    from big_data_pipeline_spark.workloads.data_quality import (
        _PROFILE_COLS,
        table_profile_summary,
    )

    rows = table_profile_summary(spark, sf_dir).collect()
    assert {r.column for r in rows} == {c for c, _ in _PROFILE_COLS}
    n_rows = {r.n_rows for r in rows}
    assert len(n_rows) == 1
    for r in rows:
        assert r.n_nulls == 0
        assert 0 < r.n_distinct <= r.n_rows
        assert r.min_value <= r.max_value or r.column == "o_totalprice"


def _write_events(spark, tmp_path, rows):
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(str(tmp_path / "events.parquet"))


def test_acf_alternating_series(spark, tmp_path):
    """Perfectly alternating series: lag-1 ACF is exactly -1 (every
    pair is (a,b) or (b,a), balanced), lag-2 exactly +1."""
    import datetime as dt

    from big_data_pipeline_spark.workloads.timeseries import acf_lag_autocorr

    base = dt.datetime(2024, 3, 1)
    rows = [
        (i, base + dt.timedelta(minutes=i), 1, "m", 5.0 if i % 2 == 0 else 1.0, "{}")
        for i in range(11)
    ]
    _write_events(spark, tmp_path, rows)
    out = {r.lag: r for r in acf_lag_autocorr(spark, str(tmp_path)).collect()}
    assert out[1].n_pairs == 10 and abs(out[1].acf + 1.0) < 1e-9
    assert out[2].n_pairs == 9 and abs(out[2].acf - 1.0) < 1e-9


def test_acf_constant_series_null(spark, tmp_path):
    import datetime as dt

    from big_data_pipeline_spark.workloads.timeseries import acf_lag_autocorr

    base = dt.datetime(2024, 3, 1)
    _write_events(
        spark, tmp_path,
        [(i, base + dt.timedelta(minutes=i), 1, "m", 2.0, "{}") for i in range(6)],
    )
    for r in acf_lag_autocorr(spark, str(tmp_path)).collect():
        assert r.acf is None  # zero variance -> NULL, never a div-by-0


def test_session_concurrency_inclusive_boundary(spark, tmp_path):
    """u2's session starts at the exact instant u1's ends: the +1
    sorts before the -1 (pri), so the shared instant counts both —
    inclusive-interval convention."""
    import datetime as dt

    from big_data_pipeline_spark.workloads.events import (
        session_concurrency_peak,
    )

    t0 = dt.datetime(2024, 3, 1, 10, 0)
    t1 = t0 + dt.timedelta(minutes=20)
    later = dt.datetime(2024, 3, 1, 14, 30)
    rows = [
        (1, t0, 1, "a", 1.0, "{}"),
        (2, t1, 1, "a", 1.0, "{}"),   # u1 session [t0, t1]
        (3, t1, 2, "a", 1.0, "{}"),   # u2 session [t1, t1]
        (4, later, 3, "a", 1.0, "{}"),  # lone session in another hour
    ]
    _write_events(spark, tmp_path, rows)
    out = {
        r.hour: r.peak_concurrency
        for r in session_concurrency_peak(spark, str(tmp_path)).collect()
    }
    assert out[dt.datetime(2024, 3, 1, 10, 0)] == 2
    assert out[dt.datetime(2024, 3, 1, 14, 0)] == 1
    assert len(out) == 2


def test_bm25_rare_term_outranks_common(spark, tmp_path):
    """Same tf/dl: the doc matching the rare query term must outrank
    docs matching the common one (idf discrimination); docs matching
    no query term never appear."""
    from big_data_pipeline_spark.workloads.text import bm25_topk_docs

    docs = [(0, "dup x x x")] + [
        (i, "scan x x x") for i in range(1, 5)
    ] + [(5, "x x x x")]
    spark.createDataFrame(docs, "doc_id long, text string").selectExpr(
        "doc_id", "text", "'en' AS lang", "'t' AS source",
        "CAST(length(text) AS BIGINT) AS n_chars",
    ).write.parquet(str(tmp_path / "documents.parquet"))
    out = bm25_topk_docs(spark, str(tmp_path)).collect()
    ids = [r.doc_id for r in out]
    assert 5 not in ids and len(out) == 5
    assert ids[0] == 0  # rare 'dup' wins
    assert out[0].tf_dup == 1 and out[0].tf_scan == 0
    assert out[0].bm25 > out[1].bm25 > 0


def test_key_skew_profile_invariants(spark, sf_dir):
    from big_data_pipeline_spark.workloads.skew import key_skew_profile

    rows = key_skew_profile(spark, sf_dir).collect()
    assert len(rows) == 10
    counts = [r.n_rows for r in rows]
    assert counts == sorted(counts, reverse=True)
    for r in rows:
        assert 0 < r.share <= 1
        assert abs(r.ratio_to_avg - r.share * r.n_keys) < 1e-12


def test_mad_robust_outliers_hand_values(spark, tmp_path):
    """8 values with one gross outlier: med = (4+5)/2, MAD = (1.5+2.5)/2,
    and only the outlier exceeds 3*MAD — the robust gate is NOT inflated
    by the outlier (the failure mode of the z-score gate)."""
    import datetime as dt

    from big_data_pipeline_spark.workloads.data_quality import (
        mad_robust_outliers,
    )

    vals = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 100.0]
    rows = [
        (i, 1, "O", v, dt.datetime(2024, 1, 1), "1-URGENT")
        for i, v in enumerate(vals)
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.parquet(str(tmp_path / "orders.parquet"))
    [r] = mad_robust_outliers(spark, str(tmp_path)).collect()
    assert r.n_rows == 8
    assert r.med == 4.5
    assert r.mad == 2.0
    assert r.n_outliers == 1


def test_ks_drift_identical_and_disjoint(spark, tmp_path):
    import datetime as dt

    from big_data_pipeline_spark.workloads.data_quality import ks_drift_stat

    base = dt.datetime(2024, 1, 1)

    def write(rows, path):
        _write_events(spark, path, rows)

    # identical distributions -> D = 0 at the smallest value
    p1 = tmp_path / "same"
    p1.mkdir()
    rows = []
    for i, v in enumerate([1.0, 2.0]):
        rows.append((2 * i, base, 1, "click", v, "{}"))
        rows.append((2 * i + 1, base, 1, "purchase", v, "{}"))
    write(rows, p1)
    [r] = ks_drift_stat(spark, str(p1)).collect()
    assert (r.n_a, r.n_b, r.ks_stat, r.at_value) == (2, 2, 0.0, 1.0)

    # disjoint supports -> D = 1 at the largest click value
    p2 = tmp_path / "disj"
    p2.mkdir()
    rows = [
        (0, base, 1, "click", 1.0, "{}"),
        (1, base, 1, "click", 2.0, "{}"),
        (2, base, 1, "purchase", 10.0, "{}"),
        (3, base, 1, "purchase", 20.0, "{}"),
    ]
    write(rows, p2)
    [r] = ks_drift_stat(spark, str(p2)).collect()
    assert (r.ks_stat, r.at_value) == (1.0, 2.0)


def test_spearman_monotone_and_ties(spark, tmp_path):
    """Perfect monotone -> rho = 1; the tied case matches the
    hand-computed average-rank Pearson (0.94868...)."""
    import math

    from big_data_pipeline_spark.workloads.data_quality import (
        spearman_rank_corr,
    )

    rows = [
        # flag A: strictly increasing together -> rho exactly 1
        ("A", 1.0, 10.0), ("A", 2.0, 25.0), ("A", 3.0, 31.0),
        # flag B: q has a tie; rho = 4.5 / sqrt(4.5 * 5)
        ("B", 1.0, 10.0), ("B", 2.0, 20.0), ("B", 2.0, 30.0),
        ("B", 3.0, 40.0),
    ]
    spark.createDataFrame(
        rows, "l_returnflag string, l_quantity double, l_extendedprice double"
    ).write.parquet(str(tmp_path / "lineitem.parquet"))
    out = {r.l_returnflag: r for r in spearman_rank_corr(spark, str(tmp_path)).collect()}
    assert abs(out["A"].spearman_rho - 1.0) < 1e-12
    want = 4.5 / math.sqrt(4.5 * 5.0)
    assert abs(out["B"].spearman_rho - want) < 1e-12
    assert out["B"].n_rows == 4


def test_bm25_no_matching_docs_empty(spark, tmp_path):
    from big_data_pipeline_spark.workloads.text import bm25_topk_docs

    spark.createDataFrame(
        [(0, "nothing here"), (1, "still nothing")],
        "doc_id long, text string",
    ).selectExpr(
        "doc_id", "text", "'en' AS lang", "'t' AS source",
        "CAST(length(text) AS BIGINT) AS n_chars",
    ).write.parquet(str(tmp_path / "documents.parquet"))
    assert bm25_topk_docs(spark, str(tmp_path)).count() == 0


def test_corr_matrix_constant_column_null(spark, tmp_path):
    """A constant measure must yield NULL correlations, not an ANSI
    DIVIDE_BY_ZERO (the guard hypothesis forced into spearman, applied
    to the Pearson matrix too)."""
    from big_data_pipeline_spark.workloads.data_quality import (
        measure_corr_matrix,
    )

    rows = [("A", 5.0, p, 0.05) for p in (10.0, 20.0, 30.0)]
    spark.createDataFrame(
        rows,
        "l_returnflag string, l_quantity double, l_extendedprice double,"
        " l_discount double",
    ).write.parquet(str(tmp_path / "lineitem.parquet"))
    out = {r.pair: r.corr for r in measure_corr_matrix(spark, str(tmp_path)).collect()}
    assert out["quantity~extendedprice"] is None  # quantity constant
    assert out["quantity~discount"] is None       # both constant
    assert out["extendedprice~discount"] is None  # discount constant


def test_mannwhitney_hand_case_and_symmetry(spark, tmp_path):
    """a = {1,2}, b = {3,4}: every b beats every a -> U_a = 0, AUC = 0;
    with one tie a={1,3}, b={3,4}: U_a = 0.5 (the tie contributes 1/2),
    AUC = 0.125."""
    import datetime as dt

    from big_data_pipeline_spark.workloads.data_quality import (
        mannwhitney_shift_test,
    )

    base = dt.datetime(2024, 1, 1)

    def run(vals_a, vals_b, d):
        rows = [
            (i, base, 1, "click", v, "{}") for i, v in enumerate(vals_a)
        ] + [
            (100 + i, base, 1, "purchase", v, "{}")
            for i, v in enumerate(vals_b)
        ]
        _write_events(spark, d, rows)
        [r] = mannwhitney_shift_test(spark, str(d)).collect()
        return r

    d1 = tmp_path / "a"; d1.mkdir()
    r = run([1.0, 2.0], [3.0, 4.0], d1)
    assert (r.n_a, r.n_b, r.u2_a, r.auc_a_over_b) == (2, 2, 0, 0.0)

    d2 = tmp_path / "b"; d2.mkdir()
    r = run([1.0, 3.0], [3.0, 4.0], d2)
    assert r.u2_a == 1          # doubled U: one tie -> 2*0.5
    assert r.auc_a_over_b == 0.125


def test_funnel_timeout_excludes_late_steps(spark, tmp_path):
    """u1 converts inside the 60-min windows; u2's click comes 2h after
    the view — counted by the plain funnel, rejected by the deadline."""
    import datetime as dt

    from big_data_pipeline_spark.workloads.behavior import (
        funnel_conversion,
        funnel_window_timeout,
    )

    t0 = dt.datetime(2024, 5, 1, 9, 0)

    def m(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    rows = [
        (1, m(0), 1, "view", 1.0, "{}"),
        (2, m(10), 1, "click", 1.0, "{}"),
        (3, m(30), 1, "purchase", 1.0, "{}"),
        (4, m(0), 2, "view", 1.0, "{}"),
        (5, m(120), 2, "click", 1.0, "{}"),
    ]
    _write_events(spark, tmp_path, rows)
    [plain] = funnel_conversion(spark, str(tmp_path)).collect()
    [gated] = funnel_window_timeout(spark, str(tmp_path)).collect()
    assert (plain.n_step1, plain.n_step2, plain.n_step3) == (2, 2, 1)
    assert (gated.n_step1, gated.n_step2, gated.n_step3) == (2, 1, 1)


def test_text_normalize_dedup_collapses_variants(spark, tmp_path):
    from big_data_pipeline_spark.workloads.text import text_normalize_dedup

    docs = [
        (0, "Hello, World!"),
        (1, "hello   world"),
        (2, "hello world"),
        (3, "different doc"),
    ]
    spark.createDataFrame(docs, "doc_id long, text string").selectExpr(
        "doc_id", "text", "'en' AS lang", "'t' AS source",
        "CAST(length(text) AS BIGINT) AS n_chars",
    ).write.parquet(str(tmp_path / "documents.parquet"))
    rows = text_normalize_dedup(spark, str(tmp_path)).collect()
    by_keeper = {r.keeper_doc_id: r for r in rows}
    assert len(rows) == 2
    assert by_keeper[0].n_docs == 3          # all three hellos collapse
    assert by_keeper[0].n_raw_variants == 3  # raw md5 sees 3 variants
    assert by_keeper[3].n_docs == 1


def test_surrogate_seq_gapless_and_ordered(spark, sf_dir):
    from big_data_pipeline_spark.workloads.advanced import (
        surrogate_global_seq,
    )

    rows = surrogate_global_seq(spark, sf_dir).collect()
    seqs = sorted(r.global_seq for r in rows)
    assert seqs == list(range(1, len(rows) + 1))  # gapless, 1-based
    ordered = sorted(rows, key=lambda r: (r.ts, r.event_id))
    assert [r.global_seq for r in ordered] == seqs  # follows (ts, id)


def test_equidepth_histogram_invariants(spark, sf_dir):
    from big_data_pipeline_spark.workloads.data_quality import (
        _HIST_BUCKETS,
        equidepth_histogram,
    )

    rows = sorted(
        equidepth_histogram(spark, sf_dir).collect(), key=lambda r: r.bucket
    )
    assert [r.bucket for r in rows] == list(range(_HIST_BUCKETS))
    total = sum(r.n_in_bucket for r in rows)
    # depths are balanced up to duplicate-atomicity: each bucket holds
    # ~n/B rows (+/- the largest duplicate run, tiny on this data)
    lo, hi = total / _HIST_BUCKETS * 0.5, total / _HIST_BUCKETS * 1.5
    for r in rows:
        assert lo <= r.n_in_bucket <= hi
        assert r.lo <= r.hi
    # bucket ranges are disjoint and ordered
    for a, b in zip(rows, rows[1:]):
        assert a.hi < b.lo

def test_sharded_running_max_equals_window(spark, sf_dir):
    """Inclusive and strict-predecessor (exclusive) running max both
    match the single-task window form for every shard count."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from big_data_pipeline_spark.io import read_table
    from big_data_pipeline_spark.operators.prefix import sharded_running_max

    ev = read_table(spark, sf_dir, "events").select(
        "event_id", "user_id", (F.col("event_id") % 11).alias("v")
    )
    base = Window.partitionBy("user_id").orderBy("event_id")
    for inclusive, end in ((True, Window.currentRow), (False, -1)):
        w = base.rowsBetween(Window.unboundedPreceding, end)
        want = sorted(
            map(tuple, ev.withColumn("m", F.max("v").over(w))
                .select("event_id", "m").collect())
        )
        for shards in (1, 4, 32):
            got = sorted(
                map(
                    tuple,
                    sharded_running_max(
                        ev, ["user_id"], "event_id", "v", "m",
                        shards=shards, inclusive=inclusive,
                    ).select("event_id", "m").collect(),
                )
            )
            assert got == want, (inclusive, shards)


def test_sharded_running_max_global_exclusive(spark):
    """The skyline frame: no partition key, strict predecessors, NULL
    for the global first row — sharded result == window result."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from big_data_pipeline_spark.operators.prefix import sharded_running_max

    rows = [(i, (i * 7919) % 101, f"r{i}") for i in range(200)]
    df = spark.createDataFrame(rows, "o int, v int, tb string")
    w = (
        Window.partitionBy()
        .orderBy("o", "tb")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    want = sorted(
        map(tuple, df.withColumn("m", F.max("v").over(w))
            .select("tb", "m").collect())
    )
    for shards in (1, 8, 16):
        got = sorted(
            map(
                tuple,
                sharded_running_max(
                    df, [], "o", "v", "m",
                    shards=shards, tiebreak_cols=["tb"], inclusive=False,
                ).select("tb", "m").collect(),
            )
        )
        assert got == want, shards
