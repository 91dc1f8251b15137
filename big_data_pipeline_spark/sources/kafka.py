"""Kafka source surface: stream reader + record parsing.

The reference ingests via an external HTTP API polled on a schedule
(SURVEY.md §2.1 S1); the Spark-native evolution of that ingest at
cluster scale is a Kafka topic feeding Structured Streaming. This
module provides the two halves separately so the testable part stays
testable everywhere:

- ``kafka_stream`` builds the ``format("kafka")`` readStream. It needs
  the spark-sql-kafka connector JAR on the cluster; where the JAR is
  absent (this container) it raises a clear RuntimeError behind
  ``kafka_available`` instead of failing deep in query planning.
- ``parse_event_records`` turns Kafka's fixed wire schema (key/value
  binary + topic/partition/offset/timestamp) into typed event rows via
  ``from_json`` — pure DataFrame ops, unit-tested on synthetic frames
  with no broker anywhere.

Scale notes: one Kafka partition maps to one Spark task; parallelism
comes from topic partitioning, so a 1000-executor cluster wants ≥1000
topic partitions (or ``minPartitions`` to re-split). ``maxOffsetsPerTrigger``
bounds micro-batch size; watermarks downstream bound state exactly as
with the file source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# payload schema for event-stream messages (mirrors the events table)
EVENT_PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


_KAFKA_CLASS_PRESENT: bool | None = None


def kafka_available() -> bool:
    """True when the spark-sql-kafka connector is on the classpath.

    The classpath probe is memoized only once a live session answers
    it; calls made BEFORE any SparkSession exists return False without
    caching, so an early probe can't pin a stale negative forever."""
    global _KAFKA_CLASS_PRESENT
    if _KAFKA_CLASS_PRESENT is not None:
        return _KAFKA_CLASS_PRESENT
    spark = SparkSession.getActiveSession()
    if spark is None:
        return False
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
        _KAFKA_CLASS_PRESENT = True
    except Exception:
        _KAFKA_CLASS_PRESENT = False
    return _KAFKA_CLASS_PRESENT


def kafka_stream(
    spark: SparkSession,
    brokers: str,
    topic: str,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """Raw Kafka stream (key/value binary + metadata columns).

    Compose with ``parse_event_records`` for typed rows and with the
    watermarked operators in streaming/windows.py downstream.
    """
    if not kafka_available():
        raise RuntimeError(
            "Kafka source requires the spark-sql-kafka connector JAR "
            "(--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version>); "
            "not present on this classpath"
        )
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    return reader.load()


def parse_event_records(
    raw: DataFrame, payload_schema: T.StructType = EVENT_PAYLOAD_SCHEMA
) -> DataFrame:
    """Kafka wire records → typed event rows.

    Keeps the source position (topic/partition/offset) for exactly-once
    bookkeeping and lineage debugging; malformed payloads surface as a
    NULL struct (from_json's PERMISSIVE default) rather than killing the
    stream — filter or quarantine downstream, mirroring
    ``io.read_json_records(keep_corrupt=True)``.
    """
    parsed = raw.select(
        F.col("topic"),
        F.col("partition"),
        F.col("offset"),
        F.col("timestamp").alias("kafka_ts"),
        F.col("key").cast("string").alias("record_key"),
        F.from_json(F.col("value").cast("string"), payload_schema).alias("payload"),
    )
    return parsed.select(
        "topic", "partition", "offset", "kafka_ts", "record_key", "payload.*"
    )
