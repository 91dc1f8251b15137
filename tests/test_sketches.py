"""KMV/theta sketch accuracy and exact-small-set behavior."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_pipeline_spark.functions.sketches import (
    kmv_estimate,
    kmv_intersect_estimate,
    kmv_sketch,
    kmv_union_estimate,
)


def _overlap_frames(spark, n_a, n_b, n_shared):
    """Two labeled sets: a = [0, n_a), b = [n_a - n_shared, n_a + n_b - n_shared)."""
    a = spark.range(0, n_a).select(
        F.lit("a").alias("g"), F.col("id").alias("v")
    )
    b = spark.range(n_a - n_shared, n_a + n_b - n_shared).select(
        F.lit("b").alias("g"), F.col("id").alias("v")
    )
    return a.unionAll(b)


def _estimates(spark, df, k):
    sk = kmv_sketch(df, "g", "v", k)
    a = sk.filter(F.col("g") == "a").select(
        F.col("sketch").alias("a_sk"), F.col("n_distinct").alias("a_n")
    )
    b = sk.filter(F.col("g") == "b").select(
        F.col("sketch").alias("b_sk"), F.col("n_distinct").alias("b_n")
    )
    row = (
        a.crossJoin(b)
        .select(
            kmv_estimate(F.col("a_sk"), F.col("a_n"), k).alias("ea"),
            kmv_union_estimate(F.col("a_sk"), F.col("b_sk"), k).alias("eu"),
            kmv_intersect_estimate(F.col("a_sk"), F.col("b_sk"), k).alias(
                "ei"
            ),
        )
        .collect()[0]
    )
    return row.ea, row.eu, row.ei


def test_kmv_exact_below_k(spark):
    """Sketches smaller than k ARE the set: estimates must be exact."""
    df = _overlap_frames(spark, 50, 40, 10)
    ea, eu, ei = _estimates(spark, df, k=256)
    assert ea == 50.0
    assert eu == 80.0
    assert ei == 10.0


def test_kmv_estimation_error_within_bounds(spark):
    """Full sketches: KMV std error ~ 1/sqrt(k-1) ≈ 6.3% at k=256.
    Deterministic hash → these are fixed values; 20% ≈ 3σ headroom."""
    df = _overlap_frames(spark, 5_000, 4_000, 2_000)
    ea, eu, ei = _estimates(spark, df, k=256)
    assert abs(ea - 5_000) / 5_000 < 0.20
    assert abs(eu - 7_000) / 7_000 < 0.20
    assert abs(ei - 2_000) / 2_000 < 0.30  # intersections are noisier


def test_theta_overlap_query_shape(spark, sf_dir):
    from big_data_pipeline_spark.workloads.llm_pipeline import (
        approx_theta_overlap,
    )

    rows = {
        r.measure: r
        for r in approx_theta_overlap(spark, sf_dir).collect()
    }
    assert set(rows) == {
        "click_users",
        "purchase_users",
        "union_users",
        "intersect_users",
    }
    for r in rows.values():
        assert r.estimate > 0
        # k=64 → ~13% std error; generous 3σ bound, deterministic values
        assert abs(r.estimate - r.exact) / max(r.exact, 1.0) < 0.45


def test_misra_gries_guarantee(spark):
    """Every key with frequency > N/(k+1) must surface, with estimate
    a lower bound within N/(k+1) of truth."""
    from big_data_pipeline_spark.functions.sketches import misra_gries_topk

    # 3 heavy keys (1000 each) drowning in 5000 singletons
    heavy = spark.range(3000).select(
        F.concat(F.lit("heavy_"), (F.col("id") % 3)).alias("v")
    )
    noise = spark.range(5000).select(
        F.concat(F.lit("noise_"), F.col("id")).alias("v")
    )
    df = heavy.unionAll(noise).repartition(8)
    got = {
        r.value: r.est_count
        for r in misra_gries_topk(df, "v", k=100, top=10).collect()
    }
    n = 8000
    for key in ("heavy_0", "heavy_1", "heavy_2"):
        assert key in got  # freq 1000 > 8000/101
        assert 1000 - n / 101 <= got[key] <= 1000


def test_cms_never_underestimates_and_is_tight_for_heavies(spark, sf_dir):
    """CMS guarantee: estimate >= true count always; with w=512 and a
    small synthetic vocab, the top tokens should be exact or nearly so."""
    from big_data_pipeline_spark.workloads.llm_pipeline import (
        cms_token_counts,
    )

    rows = cms_token_counts(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.overestimate >= 0  # the one-sided CMS error bound
        assert r.cms_estimate >= r.true_count
    # vocab << w*d: collisions are rare, most heavy tokens exact
    exact = sum(1 for r in rows if r.overestimate == 0)
    assert exact >= len(rows) * 0.5


def test_hll_estimate_within_theoretical_error(spark, sf_dir):
    """Deterministic HLL: estimates must land within ~3x the standard
    error (1.04/sqrt(m)) of the exact distinct count per group."""
    from big_data_pipeline_spark.workloads.llm_pipeline import (
        _HLL_M,
        hll_distinct_users,
    )

    rows = hll_distinct_users(spark, sf_dir).collect()
    assert rows
    bound = 3 * 1.04 / (_HLL_M ** 0.5) + 0.02  # +2% linear-count slack
    for r in rows:
        assert r.exact_distinct > 0
        # rel_error is DECIMAL(38,6)-rounded in-plan
        assert abs(
            r.rel_error
            - abs(r.hll_estimate - r.exact_distinct) / r.exact_distinct
        ) < 1e-6
        assert r.rel_error < bound
