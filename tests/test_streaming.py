"""Streaming surface: availableNow drain must equal the batch query
(SURVEY.md §7.4 — streaming has no DuckDB oracle; batch equivalence is
the check)."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_pipeline_spark.io import read_table
from big_data_pipeline_spark.streaming import (
    dedup_within_watermark,
    run_available_now,
    stream_events,
    tumbling_counts_stream,
)


def _batch_tumbling(spark, sf_dir):
    return (
        read_table(spark, sf_dir, "events")
        .groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )


def test_tumbling_stream_equals_batch(spark, sf_dir):
    stream = tumbling_counts_stream(stream_events(spark, sf_dir))
    got = run_available_now(stream, "t_tumble", output_mode="complete")
    want = _batch_tumbling(spark, sf_dir)
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_streaming_dedup_keeps_distinct_ids(spark, sf_dir):
    events = stream_events(spark, sf_dir)
    got = run_available_now(dedup_within_watermark(events), "t_dedup")
    n_distinct = read_table(spark, sf_dir, "events").select("event_id").distinct().count()
    assert got.count() == n_distinct
