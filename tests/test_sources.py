"""Custom ticker DataSource: registration, partitioned read, determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_pipeline_spark.schema import normalize_schema
from big_data_pipeline_spark.sources import register_ticker_source


def test_ticker_source_reads_per_symbol(spark):
    register_ticker_source(spark)
    bars = (
        spark.read.format("ticker")
        .option("symbols", "AAPL,MSFT")
        .option("periods", "24")
        .load()
    )
    counts = dict(
        bars.groupBy("symbol").count().collect()[i][0:2] for i in range(2)
    )
    assert counts == {"AAPL": 24, "MSFT": 24}
    # one partition per symbol
    assert bars.rdd.getNumPartitions() == 2


def test_ticker_source_deterministic_and_normalizable(spark):
    register_ticker_source(spark)
    read = lambda: (  # noqa: E731
        spark.read.format("ticker")
        .option("symbols", "GOOG")
        .option("periods", "12")
        .load()
    )
    a, b = read().toPandas(), read().toPandas()
    assert a.equals(b)
    # timestamps are offset-aware strings; normalize_schema must parse them
    norm = normalize_schema(read())
    assert norm.filter(F.col("Datetime").isNull()).count() == 0
    assert dict(norm.dtypes)["Datetime"] == "timestamp"


def test_kafka_parse_event_records(spark):
    """Payload parsing is pure DataFrame ops — testable with no broker:
    synthesize Kafka-shaped rows and round-trip the JSON payloads."""
    import json
    from datetime import datetime, timezone

    from big_data_pipeline_spark.sources.kafka import parse_event_records

    def rec(i, payload):
        return (
            "events",
            0,
            i,
            datetime(2024, 1, 1, tzinfo=timezone.utc),
            str(i).encode(),
            json.dumps(payload).encode() if payload is not None else b"not json{",
        )

    rows = [
        rec(0, {"event_id": 1, "ts": "2024-01-01T00:10:00", "user_id": 7,
                "event_type": "click", "value": 1.5, "props": "{}"}),
        rec(1, {"event_id": 2, "ts": "2024-01-01T00:11:00", "user_id": 8,
                "event_type": "purchase", "value": 9.0, "props": "{}"}),
        rec(2, None),  # malformed payload -> NULL fields, stream survives
    ]
    raw = spark.createDataFrame(
        rows, "topic string, partition int, offset long, timestamp timestamp, key binary, value binary"
    )
    got = parse_event_records(raw).orderBy("offset").collect()
    assert [r.event_id for r in got] == [1, 2, None]
    assert got[0].event_type == "click" and got[1].user_id == 8
    assert got[0].record_key == "0"
    assert {f.name for f in parse_event_records(raw).schema.fields} >= {
        "topic", "partition", "offset", "event_id", "ts", "value"
    }


def test_kafka_stream_gated_without_connector(spark):
    from big_data_pipeline_spark.sources.kafka import kafka_available, kafka_stream

    if kafka_available():
        df = kafka_stream(spark, "localhost:9092", "events")
        assert df.isStreaming
    else:
        import pytest

        with pytest.raises(RuntimeError, match="spark-sql-kafka"):
            kafka_stream(spark, "localhost:9092", "events")
