"""Semantic tests for RRF hybrid retrieval, frequent triple mining,
and time-decayed customer value."""

from __future__ import annotations

import pytest

from big_data_pipeline_spark.io import read_table
from big_data_pipeline_spark.workloads.association import (
    _MIN_PAIR_SUPPORT,
    part_triple_support,
)
from big_data_pipeline_spark.workloads.features import (
    _DECAY_MAX_K,
    _DECAY_PERIOD_DAYS,
    time_decay_customer_value,
)
from big_data_pipeline_spark.workloads.similarity import (
    _RRF_C,
    _RRF_DEPTH,
    _RRF_OUT,
    rrf_hybrid_retrieval,
)
from big_data_pipeline_spark.workloads.text import _bm25_scored


def test_rrf_fuses_both_rankings(spark, sf_dir):
    got = rrf_hybrid_retrieval(spark, sf_dir).collect()
    assert 0 < len(got) <= _RRF_OUT
    # replay the fusion from the two source rankings
    lex_rows = sorted(
        (
            (r.bm25, r.doc_id)
            for r in _bm25_scored(spark, sf_dir).collect()
            if r.doc_id != 0
        ),
        key=lambda t: (-t[0], t[1]),
    )[:_RRF_DEPTH]
    lex_rank = {doc: i + 1 for i, (_, doc) in enumerate(lex_rows)}
    for r in got:
        expect = 0.0
        if r.lex_rank is not None:
            assert lex_rank[r.doc_id] == r.lex_rank
            expect += 1.0 / (_RRF_C + r.lex_rank)
        if r.sem_rank is not None:
            expect += 1.0 / (_RRF_C + r.sem_rank)
        assert r.rrf_score == pytest.approx(expect, rel=0)
        assert r.lex_rank is not None or r.sem_rank is not None
    scores = [r.rrf_score for r in got]
    assert scores == sorted(scores, reverse=True)
    # a doc on BOTH lists at equal depth beats a doc on one list at
    # that depth: scores are genuinely fused, not single-source
    both = [r for r in got if r.lex_rank and r.sem_rank]
    assert both, "expected at least one doc ranked by both scorers"


def test_triple_support_toy(spark, tmp_path):
    rows = [
        (10, p, i) for i, p in enumerate([1, 2, 3])
    ] + [
        (11, p, i) for i, p in enumerate([1, 2, 3, 4])
    ] + [
        (12, p, i) for i, p in enumerate([1, 2, 4])
    ]
    spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long, l_linenumber int"
    ).write.parquet(str(tmp_path / "lineitem.parquet"))
    out = {
        (r.part1, r.part2, r.part3): r
        for r in part_triple_support(spark, str(tmp_path)).collect()
    }
    # (1,2,3) in baskets 10,11 and (1,2,4) in 11,12 -> support 2/3;
    # every other triple occurs once and is pruned
    assert set(out) == {(1, 2, 3), (1, 2, 4)}
    for key in out:
        assert out[key].n_baskets == _MIN_PAIR_SUPPORT == 2
        assert out[key].support == pytest.approx(2.0 / 3.0)


def test_time_decay_replays_dyadic_weights(spark, sf_dir):
    got = {
        r.o_custkey: (r.n_orders, r.decayed_value)
        for r in time_decay_customer_value(spark, sf_dir).collect()
    }
    orders = (
        read_table(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderdate", "o_totalprice")
        .collect()
    )
    max_date = max(r.o_orderdate for r in orders)
    by_cust: dict[int, list] = {}
    for r in orders:
        by_cust.setdefault(r.o_custkey, []).append(r)
    assert set(got) == set(by_cust)
    for cust, rows in by_cust.items():
        num = 0
        for r in rows:
            days = (max_date - r.o_orderdate).days
            k = min(days // _DECAY_PERIOD_DAYS, _DECAY_MAX_K)
            num += round(r.o_totalprice * 100.0) * (1 << (_DECAY_MAX_K - k))
        expect = num / (100 * (1 << _DECAY_MAX_K))
        n, val = got[cust]
        assert n == len(rows)
        assert val == pytest.approx(expect, rel=1e-15)
        # decayed value never exceeds the undecayed total
        assert val <= sum(r.o_totalprice for r in rows) + 1e-9
