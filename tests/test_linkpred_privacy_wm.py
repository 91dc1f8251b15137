"""Golden/semantic tests for the round-4 batch: resource-allocation
link prediction, t-closeness audit, weighted median, and Holt's linear
forecast — each replayed with plain Python over the same rows."""

from __future__ import annotations

import pytest

from big_data_pipeline_spark.io import read_table
from big_data_pipeline_spark.workloads.advanced import (
    weighted_median_brand_price,
)
from big_data_pipeline_spark.workloads.association import (
    _RA_CAP,
    _RA_TOP_K,
    copurchase_link_prediction,
)
from big_data_pipeline_spark.workloads.timeseries import (
    _HOLT_ALPHA,
    holt_linear_forecast,
)
from big_data_pipeline_spark.workloads.training_data import (
    _TC_K,
    t_closeness_audit,
)

# --- copurchase_link_prediction ---------------------------------------------


def _copurchase_edges(spark, sf_dir):
    rows = (
        read_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .collect()
    )
    baskets: dict[int, set] = {}
    for r in rows:
        baskets.setdefault(r.l_orderkey, set()).add(r.l_partkey)
    from collections import Counter

    pair_cnt: Counter = Counter()
    for parts in baskets.values():
        ps = sorted(parts)
        for i, u in enumerate(ps):
            for v in ps[i + 1 :]:
                pair_cnt[(u, v)] += 1
    return {p: c for p, c in pair_cnt.items() if c >= 2}


def test_link_prediction_excludes_edges_and_replays_scores(spark, sf_dir):
    edges = _copurchase_edges(spark, sf_dir)
    got = copurchase_link_prediction(spark, sf_dir).collect()
    assert 0 < len(got) <= _RA_TOP_K
    # replay: capped adjacency, true degree, RA score at 6dp decimal
    adj: dict[int, list] = {}
    for (u, v), c in edges.items():
        adj.setdefault(u, []).append((c, v))
        adj.setdefault(v, []).append((c, u))
    deg = {z: len(nbrs) for z, nbrs in adj.items()}
    capped = {
        z: {v for _, v in sorted(nbrs, key=lambda t: (-t[0], t[1]))[:_RA_CAP]}
        for z, nbrs in adj.items()
    }
    from collections import defaultdict

    score: dict[tuple, float] = defaultdict(float)
    common: dict[tuple, int] = defaultdict(int)
    for z, nbrs in capped.items():
        ns = sorted(nbrs)
        for i, u in enumerate(ns):
            for w in ns[i + 1 :]:
                score[(u, w)] += round(1.0 / deg[z], 6)
                common[(u, w)] += 1
    for r in got:
        key = (r.part1, r.part2)
        assert key not in edges  # predicted links only
        assert r.n_common_neighbors == common[key]
        assert r.ra_score == pytest.approx(score[key], abs=1e-9)
    scores = [r.ra_score for r in got]
    assert scores == sorted(scores, reverse=True)


# --- t_closeness_audit ------------------------------------------------------


def test_t_closeness_replays_integer_emd(spark, sf_dir):
    rows = t_closeness_audit(spark, sf_dir).collect()
    assert rows
    cust = (
        read_table(spark, sf_dir, "customer")
        .select("c_nationkey", "c_mktsegment", "c_acctbal")
        .collect()
    )
    n_total = len(cust)

    def bucket(bal):
        return min(max(int((bal - (-1000.0)) // 1100.0), 0), _TC_K - 1)

    from collections import Counter

    glob = Counter(bucket(c.c_acctbal) for c in cust)
    groups: dict[tuple, Counter] = {}
    for c in cust:
        groups.setdefault(
            (c.c_nationkey, c.c_mktsegment), Counter()
        )[bucket(c.c_acctbal)] += 1
    assert len(rows) == len(groups)
    for r in rows:
        g = groups[(r.c_nationkey, r.c_mktsegment)]
        n_g = sum(g.values())
        assert r.k_size == n_g
        num, cumq, cump = 0, 0, 0
        for b in range(_TC_K - 1):
            cumq += g.get(b, 0)
            cump += glob.get(b, 0)
            num += abs(cumq * n_total - cump * n_g)
        expect = num / (n_g * n_total * (_TC_K - 1))
        assert r.emd == pytest.approx(expect, rel=1e-12)
        assert 0.0 <= r.emd <= 1.0
    # group sizes tile the table
    assert sum(r.k_size for r in rows) == n_total


# --- weighted_median_brand_price --------------------------------------------


def test_weighted_median_replays_half_mass_rule(spark, sf_dir):
    got = {
        r.p_brand: (r.total_quantity, r.weighted_median_price)
        for r in weighted_median_brand_price(spark, sf_dir).collect()
    }
    assert got
    lineitem = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    li = (
        lineitem.join(part, lineitem.l_partkey == part.p_partkey)
        .select("p_brand", "l_extendedprice", "l_quantity")
        .collect()
    )
    by_brand: dict[str, list] = {}
    for r in li:
        by_brand.setdefault(r.p_brand, []).append(
            (r.l_extendedprice, int(r.l_quantity))
        )
    for brand, pairs in by_brand.items():
        pairs.sort()
        tot = sum(w for _, w in pairs)
        cum = 0
        med = None
        for p, w in pairs:
            cum += w
            if 2 * cum >= tot:
                med = p
                break
        assert got[brand] == (tot, med)


# --- holt_linear_forecast ---------------------------------------------------


def test_holt_replays_recurrence(spark, sf_dir):
    got = {
        r.user_id: r for r in holt_linear_forecast(spark, sf_dir).collect()
    }
    rows = (
        read_table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "value")
        .collect()
    )
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append((r.ts, r.event_id, r.value))
    assert set(got) == set(by_user)
    for uid, evs in by_user.items():
        evs.sort()
        vals = [v for _, _, v in evs]
        lvl, trd = float(vals[0]), 0.0
        for y in vals[1:]:
            nxt = _HOLT_ALPHA * y + (1.0 - _HOLT_ALPHA) * (lvl + trd)
            trd = _HOLT_ALPHA * (nxt - lvl) + (1.0 - _HOLT_ALPHA) * trd
            lvl = nxt
        r = got[uid]
        assert r.n_obs == len(vals)
        assert r.level == lvl  # identical IEEE op sequence -> exact
        assert r.trend == trd
        assert r.forecast_next == lvl + trd
