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
