"""Golden tests for the robust-trend / drawdown / concentration batch:
replay each closed-form plan with plain Python over the same rows."""

from __future__ import annotations

import statistics

import pytest

from big_data_pipeline_spark.io import read_table
from big_data_pipeline_spark.workloads.llm_pipeline import (
    gini_source_concentration,
)
from big_data_pipeline_spark.workloads.timeseries import (
    max_drawdown_per_user,
    theilsen_trend_per_user,
)


def _series_by_user(spark, sf_dir):
    rows = (
        read_table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "value")
        .collect()
    )
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append((r.ts, r.event_id, r.value))
    for evs in by_user.values():
        evs.sort()
    return by_user


def test_theilsen_matches_median_of_pairwise_slopes(spark, sf_dir):
    got = {
        r.user_id: (r.n_pairs, r.ts_slope)
        for r in theilsen_trend_per_user(spark, sf_dir).collect()
    }
    for uid, evs in _series_by_user(spark, sf_dir).items():
        vals = [v for _, _, v in evs]
        slopes = sorted(
            (vals[j] - vals[i]) / (j - i)
            for i in range(len(vals))
            for j in range(i + 1, len(vals))
        )
        n_pairs, slope = got[uid]
        assert n_pairs == len(slopes)
        assert slope == pytest.approx(statistics.median(slopes), rel=1e-12)


def test_pair_join_trailing_cap_bounds_hot_keys(spark, tmp_path):
    """The O(n²)-per-key trend ops enforce the trailing-_TS_PAIR_CAP
    gate IN-PLAN: a key longer than the cap contributes exactly
    cap*(cap-1)/2 pairs (never n²), and the statistic is computed over
    the LAST cap observations — verified against a Python replay."""
    import datetime
    import statistics

    from big_data_pipeline_spark.workloads.timeseries import (
        _TS_PAIR_CAP,
        mann_kendall_trend,
        theilsen_trend_per_user,
    )

    n_hot = _TS_PAIR_CAP + 64
    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (i, t0 + datetime.timedelta(minutes=i), 1, "view",
         float((i * 37) % 101) + 0.01 * i, "{}")
        for i in range(n_hot)
    ] + [
        (10_000 + i, t0 + datetime.timedelta(minutes=i), 2, "view",
         float(i * i), "{}")
        for i in range(10)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    sf = str(tmp_path)

    ts = {r.user_id: r for r in theilsen_trend_per_user(spark, sf).collect()}
    mk = {r.user_id: r for r in mann_kendall_trend(spark, sf).collect()}

    cap_pairs = _TS_PAIR_CAP * (_TS_PAIR_CAP - 1) // 2
    assert ts[1].n_pairs == cap_pairs  # bounded, NOT n_hot*(n_hot-1)/2
    assert ts[2].n_pairs == 10 * 9 // 2  # short keys untouched
    assert mk[1].n == _TS_PAIR_CAP
    assert mk[2].n == 10

    # replay over the trailing cap window only
    tail = [float((i * 37) % 101) + 0.01 * i
            for i in range(n_hot - _TS_PAIR_CAP, n_hot)]
    slopes = sorted(
        (tail[j] - tail[i]) / (j - i)
        for i in range(len(tail))
        for j in range(i + 1, len(tail))
    )
    assert ts[1].ts_slope == pytest.approx(
        statistics.median(slopes), rel=1e-12
    )
    s = sum(
        (tail[j] > tail[i]) - (tail[j] < tail[i])
        for i in range(len(tail))
        for j in range(i + 1, len(tail))
    )
    assert mk[1].s == s


def test_max_drawdown_matches_sequential_replay(spark, sf_dir):
    got = {
        r.user_id: (r.max_drawdown, r.trough_ts)
        for r in max_drawdown_per_user(spark, sf_dir).collect()
    }
    from decimal import ROUND_HALF_UP, Decimal

    q6 = Decimal("0.000001")
    for uid, evs in _series_by_user(spark, sf_dir).items():
        # replicate the plan exactly: each VALUE rounds to DECIMAL(38,6)
        # (HALF_UP, from the exact binary double), the running sum is
        # exact decimal, the cast back to double happens per row
        cum = Decimal(0)
        peak = None
        best = (Decimal(-1), None)
        for ts, _, v in evs:
            cum += Decimal(v).quantize(q6, rounding=ROUND_HALF_UP)
            peak = cum if peak is None or cum > peak else peak
            dd = peak - cum
            if dd > best[0]:
                best = (dd, ts)
        mdd, trough = got[uid]
        assert mdd == pytest.approx(float(best[0]), abs=1e-9)
        if float(best[0]) > 1e-9:  # ties at ~0 make the trough ambiguous
            assert trough == best[1]


def test_gini_bounds_and_reference_formula(spark, sf_dir):
    rows = gini_source_concentration(spark, sf_dir).collect()
    assert rows
    docs = (
        read_table(spark, sf_dir, "documents")
        .select("source", "n_chars", "doc_id")
        .collect()
    )
    by_source: dict[str, list] = {}
    for d in docs:
        by_source.setdefault(d.source, []).append((d.n_chars, d.doc_id))
    for r in rows:
        xs = sorted(by_source[r.source])
        n = len(xs)
        total = sum(x for x, _ in xs)
        rank_mass = sum((i + 1) * x for i, (x, _) in enumerate(xs))
        expect = (2.0 * rank_mass) / (n * total) - (n + 1) / n
        assert r.n_docs == n
        assert r.total_chars == total
        assert r.gini == pytest.approx(expect, rel=1e-12)
        assert 0.0 <= r.gini < 1.0
