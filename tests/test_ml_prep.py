"""Semantic tests for the ml_prep / round-4 operator batch: the oracle
sweep proves cross-engine equality; these prove the operators compute
the RIGHT thing (classifier quality, estimator bias, LOF calibration,
CF symmetry, recurrence equivalence)."""

from __future__ import annotations

import math

import pytest

from big_data_pipeline_spark.workloads.association import (
    item_item_cosine_topk,
)
from big_data_pipeline_spark.workloads.features import (
    ses_forecast_user_value,
)
from big_data_pipeline_spark.workloads.ml_prep import (
    chi2_token_lang,
    lof_knn_outliers,
    nb_lang_confusion,
)
from big_data_pipeline_spark.workloads.text import (
    shingle_containment_pairs,
)
from big_data_pipeline_spark.workloads.training_data import (
    rr_dp_status_counts,
)


def test_nb_classifier_beats_chance_and_partitions_corpus(spark, sf_dir):
    rows = nb_lang_confusion(spark, sf_dir).collect()
    total = sum(r.n_docs for r in rows)
    diag = sum(r.n_docs for r in rows if r.actual_lang == r.pred_lang)
    from big_data_pipeline_spark.io import read_table

    docs = read_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    assert total == n_docs  # every document classified exactly once
    # the synthetic corpus shares one vocabulary across langs — only the
    # stopword mix differs — so absolute accuracy is capped low; the
    # classifier must still beat always-predicting the majority class
    majority = max(
        r[1] for r in docs.groupBy("lang").count().collect()
    )
    assert diag > majority


def test_chi2_ranks_are_dense_and_scores_sorted(spark, sf_dir):
    rows = chi2_token_lang(spark, sf_dir).collect()
    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    for lang, rs in by_lang.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        scores = [r.chi2 for r in rs]
        assert all(s >= 0 for s in scores)
        assert scores == sorted(scores, reverse=True)
        assert all(r.df_in_lang >= 1 for r in rs)


def test_lof_scores_calibrated_around_one(spark, sf_dir):
    rows = lof_knn_outliers(spark, sf_dir).collect()
    assert len(rows) > 0
    assert [r.out_rank for r in rows] == list(range(1, len(rows) + 1))
    lofs = [r.lof for r in rows]
    assert lofs == sorted(lofs, reverse=True)
    # LOF is a density ratio: inliers cluster near 1; nothing can be
    # hugely below ~0.4 and the top outlier should exceed 1
    assert lofs[0] > 1.0
    assert all(l > 0.3 for l in lofs)
    assert all(r.kdist > 0 and r.lrd > 0 for r in rows)


def test_rr_estimator_debiases_within_sampling_noise(spark, sf_dir):
    rows = rr_dp_status_counts(spark, sf_dir).collect()
    n_total = sum(r.n_true for r in rows)
    assert sum(r.n_reported for r in rows) == n_total  # mechanism is 1:1
    # Warner estimator: stdev of the estimate is sqrt(N q (1-q))/p per
    # cell; the deterministic coin realizes one draw — allow 5 sigma
    p, q = 0.75, 0.25 / 3
    bound = 5 * math.sqrt(n_total * q * (1 - q)) / p + 1
    for r in rows:
        assert abs(r.n_estimated - r.n_true) < bound


def test_ses_matches_sequential_recurrence(spark, sf_dir):
    from big_data_pipeline_spark.io import read_table

    got = {
        r.user_id: (r.n_events, r.ses_value)
        for r in ses_forecast_user_value(spark, sf_dir).collect()
    }
    events = (
        read_table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "value")
        .collect()
    )
    series: dict[int, list] = {}
    for e in events:
        series.setdefault(e.user_id, []).append((e.ts, e.event_id, e.value))
    for uid, evs in series.items():
        evs.sort()
        s = evs[0][2]
        for _, _, v in evs[1:]:
            s = (v + s) / 2.0
        n, ses = got[uid]
        assert n == len(evs)
        # DECIMAL(38,6) term rounding bounds the drift at n*5e-7
        assert ses == pytest.approx(s, abs=len(evs) * 5e-7 + 1e-9)


def test_cf_cosine_bounds_and_symmetry(spark, sf_dir):
    rows = item_item_cosine_topk(spark, sf_dir).collect()
    assert len(rows) > 0
    pair_scores = {(r.part_i, r.part_j): r.cosine for r in rows}
    for r in rows:
        assert 0.0 < r.cosine <= 1.0 + 1e-12
        assert 1 <= r.rank <= 5
        assert r.n_common_users >= 2
        # cosine is symmetric: if the mirror pair also ranked, same score
        mirror = pair_scores.get((r.part_j, r.part_i))
        if mirror is not None:
            assert mirror == pytest.approx(r.cosine, rel=1e-12)


def test_containment_dominates_jaccard(spark, sf_dir):
    rows = shingle_containment_pairs(spark, sf_dir).collect()
    for r in rows:
        assert r.containment >= 0.8
        # |A∩B|/min ≥ |A∩B|/|A∪B| always
        assert r.containment >= r.jaccard - 1e-12
        assert r.doc_id1 < r.doc_id2
