"""Semantic invariants for the experimentation / encoder / SCD2 batch.

The DuckDB oracle pins cell-exact values (tools/check_oracle.py); these
tests pin the STATISTICAL and structural properties the oracle can't
express — conservation laws, group identities, history invariants.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from big_data_pipeline_spark.workloads.cdc_feed import (
    _SCD_T2,
    scd2_priority_history,
)
from big_data_pipeline_spark.workloads.experiments import (
    ab_conversion_ztest,
    cuped_adjusted_lift,
)
from big_data_pipeline_spark.workloads.ml_prep import (
    _FH_BUCKETS,
    feature_hashing_vectorize,
    target_encoding_loo,
)


def test_ztest_counts_partition_users(spark, sf_dir):
    r = ab_conversion_ztest(spark, sf_dir).collect()[0]
    n_users = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id")
        .distinct()
        .count()
    )
    assert r.n_a + r.n_b == n_users
    assert 0 < r.conv_a < r.n_a and 0 < r.conv_b < r.n_b
    assert math.isfinite(r.z_stat)
    assert r.significant_95 == (abs(r.z_stat) >= 1.959963984540054)
    assert r.abs_lift == pytest.approx(r.rate_b - r.rate_a)


def test_cuped_preserves_weighted_mean_and_reduces_variance(spark, sf_dir):
    rows = {r.variant: r for r in cuped_adjusted_lift(spark, sf_dir).collect()}
    assert set(rows) == {0, 1}
    a, b = rows[0], rows[1]
    # one global theta
    assert a.theta == b.theta and math.isfinite(a.theta)
    # the adjustment term has zero mean over ALL users, so the pooled
    # weighted mean is conserved (CUPED shifts variance, not the mean)
    n = a.n_users + b.n_users
    pooled_post = (a.mean_post * a.n_users + b.mean_post * b.n_users) / n
    pooled_adj = (
        a.mean_adjusted * a.n_users + b.mean_adjusted * b.n_users
    ) / n
    assert pooled_adj == pytest.approx(pooled_post, rel=1e-9)


def test_target_encoding_loo_group_identity(spark, sf_dir):
    enc = target_encoding_loo(spark, sf_dir)
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    assert enc.count() == orders.count()
    # mean of LOO encodings within a category equals the category mean:
    # avg_i (S - x_i)/(n-1) = (nS - S)/(n(n-1)) = S/n
    got = {
        r.o_orderpriority: r.m
        for r in enc.groupBy("o_orderpriority")
        .agg(F.avg("loo_enc").alias("m"))
        .collect()
    }
    want = {
        r.o_orderpriority: r.m
        for r in orders.groupBy("o_orderpriority")
        .agg(F.avg("o_totalprice").alias("m"))
        .collect()
    }
    for k, v in want.items():
        assert got[k] == pytest.approx(v, rel=1e-9)


def test_feature_hashing_shape_and_mass(spark, sf_dir):
    fh = feature_hashing_vectorize(spark, sf_dir)
    r = fh.agg(
        F.min("bucket").alias("lo"),
        F.max("bucket").alias("hi"),
        F.sum(F.abs(F.col("weight"))).alias("mass"),
    ).collect()[0]
    assert 0 <= r.lo and r.hi < _FH_BUCKETS
    n_tokens = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(F.explode(F.split(F.trim("text"), r"\s+")).alias("t"))
        .count()
    )
    # signed cancellation can only shrink the mass, never grow it
    assert 0 < r.mass <= n_tokens
    # deterministic: a second plan evaluates to the identical frame
    assert fh.exceptAll(feature_hashing_vectorize(spark, sf_dir)).count() == 0


def test_scd2_history_invariants(spark, sf_dir):
    hist = scd2_priority_history(spark, sf_dir)
    per_key = hist.groupBy("o_custkey").agg(
        F.sum(F.col("is_current").cast("int")).alias("n_open"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    # exactly one open row per key, at most one closed predecessor
    assert per_key.filter(F.col("n_open") != 1).count() == 0
    assert per_key.filter(F.col("n_rows") > 2).count() == 0
    closed = hist.filter(~F.col("is_current"))
    assert closed.filter(
        F.col("valid_to") != F.lit(_SCD_T2).cast("timestamp")
    ).count() == 0
    # every closed row has a successor with a different tracked value
    succ = closed.alias("c").join(
        hist.filter(F.col("is_current")).alias("o"), "o_custkey"
    )
    assert succ.count() == closed.count()
    assert (
        succ.filter(
            F.col("c.o_orderpriority") == F.col("o.o_orderpriority")
        ).count()
        == 0
    )


def test_srm_check_counts_and_flag(spark, sf_dir):
    from big_data_pipeline_spark.workloads.experiments import srm_chi2_check

    r = srm_chi2_check(spark, sf_dir).collect()[0]
    n_users = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id")
        .distinct()
        .count()
    )
    assert r.n_a + r.n_b == n_users
    assert r.expected_per_arm == pytest.approx(n_users / 2)
    assert r.chi2 >= 0
    assert r.srm_detected == (r.chi2 >= 3.841458820694124)


def test_did_estimate_identity(spark, sf_dir):
    from big_data_pipeline_spark.workloads.experiments import (
        did_purchase_lift,
    )

    r = did_purchase_lift(spark, sf_dir).collect()[0]
    assert r.did_estimate == pytest.approx(
        (r.b_post - r.b_pre) - (r.a_post - r.a_pre)
    )
    for v in (r.a_pre, r.a_post, r.b_pre, r.b_post):
        assert math.isfinite(v) and v >= 0


def test_span_corruption_plan_ratio_and_bounds(spark, sf_dir):
    from big_data_pipeline_spark.workloads.llm_pipeline import (
        _SPAN_LEN,
        span_corruption_plan,
    )

    rows = span_corruption_plan(spark, sf_dir).collect()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert len(rows) == n_docs
    total_masked = sum(r.n_masked for r in rows)
    total_tokens = sum(r.n_tokens for r in rows)
    for r in rows:
        # spans can overlap/truncate, never exceed L per start
        assert r.n_masked <= min(r.n_tokens, r.n_spans * _SPAN_LEN)
        assert (r.n_spans == 0) == (r.n_masked == 0)
        assert r.mask_ratio == pytest.approx(r.n_masked / r.n_tokens)
    # corpus-level realized ratio lands near the designed schedule
    assert 0.05 < total_masked / total_tokens < 0.4


def test_scd2_asof_equals_direct_snapshot(spark, sf_dir):
    from big_data_pipeline_spark.workloads.cdc_feed import (
        _SCD_T1,
        scd2_asof_snapshot,
    )
    from pyspark.sql import Window

    got = scd2_asof_snapshot(spark, sf_dir)
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    direct = (
        orders.filter(F.col("o_orderdate") < F.lit(_SCD_T1).cast("timestamp"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderpriority")
    )
    assert got.exceptAll(direct).count() == 0
    assert direct.exceptAll(got).count() == 0


def test_corrupt_quarantine_statuses(spark, sf_dir):
    from big_data_pipeline_spark.workloads.multimodal import (
        multimodal_corrupt_quarantine,
    )

    rows = multimodal_corrupt_quarantine(spark, sf_dir).collect()
    by = {}
    for r in rows:
        by.setdefault(r.status, []).append(r)
    assert set(by) == {"ok", "bad_magic", "truncated"}
    for r in by["ok"]:
        assert r.width == 16 and r.height >= 1
    for s in ("bad_magic", "truncated"):
        assert all(r.width is None and r.height is None for r in by[s])
        # the deterministic corruption rule drives classification
        mod = 0 if s == "bad_magic" else 1
        assert all(r.doc_id % 7 == mod for r in by[s])


def test_conformal_coverage_near_nominal(spark, sf_dir):
    from big_data_pipeline_spark.workloads.ml_prep import (
        conformal_interval_report,
    )

    r = conformal_interval_report(spark, sf_dir).collect()[0]
    assert r.n_cal > 0 and r.n_test > 0
    assert r.q_alpha > 0
    assert r.n_covered <= r.n_test
    # split-conformal guarantees >= 1 - alpha coverage in expectation;
    # allow finite-sample slack below the nominal 0.9
    assert r.coverage >= 0.8


def test_hitrate_eval_bounds(spark, sf_dir):
    from big_data_pipeline_spark.workloads.association import cf_hitrate_eval

    rows = cf_hitrate_eval(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_hit <= r.n_test_users
        assert r.hitrate_at_k == pytest.approx(r.n_hit / r.n_test_users)
    # popularity baseline must beat zero somewhere on this corpus
    assert any(r.n_hit > 0 for r in rows)


def test_delta_method_ci_brackets_ratio(spark, sf_dir):
    from big_data_pipeline_spark.workloads.experiments import (
        delta_method_ratio_ci,
    )

    rows = delta_method_ratio_ci(spark, sf_dir).collect()
    assert len(rows) == 2
    for r in rows:
        assert r.se > 0
        assert r.ci_low < r.ratio < r.ci_high
        assert r.ci_high - r.ratio == pytest.approx(r.ratio - r.ci_low)


def test_preference_pairs_positive_margin_disjoint(spark, sf_dir):
    from big_data_pipeline_spark.workloads.training_data import (
        preference_pair_assembly,
    )

    rows = preference_pair_assembly(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.margin > 0
        assert r.chosen_id != r.rejected_id
    # a document never appears as chosen AND rejected within a source
    per_src = {}
    for r in rows:
        c, x = per_src.setdefault(r.source, (set(), set()))
        c.add(r.chosen_id)
        x.add(r.rejected_id)
    for c, x in per_src.values():
        assert not (c & x)


def test_sgns_pairs_mass_and_labels(spark, sf_dir):
    from big_data_pipeline_spark.workloads.training_data import (
        sgns_training_pairs,
    )

    df = sgns_training_pairs(spark, sf_dir)
    agg = {
        r.label: r.s
        for r in df.groupBy("label").agg(F.sum("n").alias("s")).collect()
    }
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_tokens = docs.select(
        F.explode(F.split(F.trim("text"), r"\s+")).alias("t")
    ).count()
    n_docs = docs.count()
    # positives: 2 orientations x (n_tokens - n_docs) adjacent pairs
    assert agg[1] == 2 * (n_tokens - n_docs)
    # exactly one negative per position
    assert agg[0] == n_tokens


def test_zipf_fit_sane(spark, sf_dir):
    from big_data_pipeline_spark.workloads.text import zipf_fit_report

    r = zipf_fit_report(spark, sf_dir).collect()[0]
    assert r.n_types > 0 and r.n_tokens >= r.n_types
    # frequency decreases with rank: negative slope, meaningful fit
    assert r.zipf_slope < 0
    assert 0 <= r.r2 <= 1


def test_power_mde_consistent_with_ztest(spark, sf_dir):
    from big_data_pipeline_spark.workloads.experiments import ab_power_mde

    r = ab_power_mde(spark, sf_dir).collect()[0]
    assert 0 < r.base_rate < 1
    assert r.mde_abs > 0
    assert r.mde_rel == pytest.approx(r.mde_abs / r.base_rate)
    # shrinking traffic can only inflate the MDE: se scales 1/sqrt(n)
    assert r.mde_abs < 1.0


def test_hazard_table_risk_set_telescopes(spark, sf_dir):
    from big_data_pipeline_spark.workloads.behavior import (
        conversion_hazard_table,
    )

    rows = sorted(
        conversion_hazard_table(spark, sf_dir).collect(), key=lambda r: r.day
    )
    assert rows
    n_users = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id")
        .distinct()
        .count()
    )
    # the earliest risk set is everyone; each day's exits telescope
    assert rows[0].n_at_risk == n_users
    for prev, cur in zip(rows, rows[1:]):
        assert cur.n_at_risk == prev.n_at_risk - prev.n_conv - prev.n_censored
        assert 0 <= cur.hazard <= 1


def test_ohlc_bars_internally_consistent(spark, sf_dir):
    from big_data_pipeline_spark.workloads.timeseries import (
        ohlc_daily_resample,
    )

    rows = ohlc_daily_resample(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.low <= r.open <= r.high
        assert r.low <= r.close <= r.high
        assert r.volume >= 1
        if r.volume == 1:
            assert r.open == r.close == r.high == r.low


def test_percolator_respects_forbidden_terms(spark, sf_dir):
    from big_data_pipeline_spark.workloads.text import (
        percolator_match_counts,
    )

    got = {
        r.query_id: r.n_matching_docs
        for r in percolator_match_counts(spark, sf_dir).collect()
    }
    assert set(got) == {"slow_tables", "spark_sort", "hash_merge",
                        "plain_rows"}
    assert all(v >= 0 for v in got.values())
    assert any(v > 0 for v in got.values())


def test_keyset_page_matches_offset_semantics(spark, sf_dir):
    from big_data_pipeline_spark.workloads.relational import (
        _PAGE_ANCHOR_KEY,
        _PAGE_ANCHOR_PRICE,
        keyset_pagination_page,
    )

    page = keyset_pagination_page(spark, sf_dir).collect()
    assert 0 < len(page) <= 10
    # every row is strictly after the anchor in the total order
    for r in page:
        assert (r.o_totalprice, -r.o_orderkey) < (
            _PAGE_ANCHOR_PRICE,
            -_PAGE_ANCHOR_KEY,
        )
    prices = [(-r.o_totalprice, r.o_orderkey) for r in page]
    assert prices == sorted(prices)


def test_position_attribution_conserves_credit(spark, sf_dir):
    from big_data_pipeline_spark.workloads.behavior import (
        position_attribution_credit,
    )

    rows = position_attribution_credit(spark, sf_dir).collect()
    total = sum(r.milli_credit for r in rows)
    # exactly 1000 milli-credits per converting user with >= 1 touch
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    conv = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("conv_ts"))
    )
    n_users = (
        events.join(conv, "user_id")
        .filter(
            (F.col("ts") < F.col("conv_ts"))
            & (F.col("event_type") != "purchase")
        )
        .select("user_id")
        .distinct()
        .count()
    )
    assert total == 1000 * n_users


def test_churn_labels_are_leakage_safe(spark, sf_dir):
    from big_data_pipeline_spark.workloads.features import (
        _CHURN_SPLIT,
        churn_label_features,
    )

    df = churn_label_features(spark, sf_dir)
    rows = df.collect()
    assert rows
    split = _CHURN_SPLIT
    for r in rows:
        # features never read the label period
        assert str(r.last_seen_feat) < split
        assert r.n_events_feat > 0
        assert r.active_days_feat >= 1
    # both classes exist, otherwise the label is degenerate
    labels = {r.churned for r in rows}
    assert labels == {True, False}


def test_interarrival_rates_sane(spark, sf_dir):
    from big_data_pipeline_spark.workloads.events import (
        interarrival_rate_mle,
    )

    rows = interarrival_rate_mle(spark, sf_dir).collect()
    assert len(rows) == 5  # one per event type
    for r in rows:
        assert r.n_gaps > 0
        assert r.mean_gap_sec > 0
        assert r.rate_per_hour == pytest.approx(3600.0 / r.mean_gap_sec)
        assert r.cv > 0
