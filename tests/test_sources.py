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


# --- http backend (S1/S2): fake in-process market API -----------------------


def _bars_json(symbol: str, periods: int) -> bytes:
    import json

    from big_data_pipeline_spark.sources.ticker import synthetic_bar_range

    pdf = synthetic_bar_range(symbol, 42, 0, periods)
    out = [
        {
            "Datetime": row.Datetime,
            "Open": float(row.Open),
            "High": float(row.High),
            "Low": float(row.Low),
            "Close": float(row.Close),
            "Volume": int(row.Volume),
        }
        for row in pdf.itertuples(index=False)
    ]
    return json.dumps(out).encode()


def _start_fake_api():
    """Tiny HTTP server answering /bars?symbol=X&periods=N; returns
    (server, thread, port, request_log)."""
    import threading
    from http.server import BaseHTTPRequestHandler, HTTPServer
    from urllib.parse import parse_qs, urlparse

    log = []

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            q = parse_qs(urlparse(self.path).query)
            sym = q["symbol"][0]
            periods = int(q["periods"][0])
            log.append(sym)
            body = b"[]" if sym == "EMPTY" else _bars_json(sym, periods)
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):  # silence
            pass

    srv = HTTPServer(("127.0.0.1", 0), Handler)
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()
    return srv, th, srv.server_address[1], log


def test_ticker_http_backend_matches_synthetic(spark):
    srv, _, port, log = _start_fake_api()
    try:
        register_ticker_source(spark)
        endpoint = (
            f"http://127.0.0.1:{port}/bars?symbol={{symbol}}&periods={{periods}}"
        )
        read = lambda backend: (  # noqa: E731
            spark.read.format("ticker")
            .option("symbols", "AAPL,MSFT,EMPTY")
            .option("periods", "24")
            .option("backend", backend)
            .option("endpoint", endpoint)
            .option("rate_limit_sec", "0.01")
            .load()
        )
        http_pdf = read("http").toPandas().sort_values(["symbol", "Datetime"])
        syn = (
            spark.read.format("ticker")
            .option("symbols", "AAPL,MSFT")
            .option("periods", "24")
            .load()
            .toPandas()
            .sort_values(["symbol", "Datetime"])
        )
        # EMPTY symbol → S3 guard: no rows, no error
        assert sorted(set(http_pdf["symbol"])) == ["AAPL", "MSFT"]
        assert http_pdf.reset_index(drop=True).equals(syn.reset_index(drop=True))
        assert sorted(log) == ["AAPL", "EMPTY", "MSFT"]  # one fetch per symbol
    finally:
        srv.shutdown()


def test_ticker_http_backend_requires_endpoint(spark):
    import pytest

    register_ticker_source(spark)
    with pytest.raises(Exception, match="endpoint"):
        (
            spark.read.format("ticker")
            .option("backend", "http")
            .load()
            .count()
        )


def test_rate_limiter_spaces_requests():
    from big_data_pipeline_spark.sources.ticker import RateLimiter

    t = {"now": 100.0}
    slept = []

    def clock():
        return t["now"]

    def sleep(s):
        slept.append(s)
        t["now"] += s

    rl = RateLimiter(clock=clock, sleep=sleep)
    assert rl.wait(1.0) == 0.0  # first request immediate
    assert rl.wait(1.0) == 1.0  # second waits the full interval
    t["now"] += 5.0  # long gap — no wait, no debt accumulation
    assert rl.wait(1.0) == 0.0


def test_ticker_stream_reader_drains_to_batch_equality(spark, tmp_path):
    """The streaming ticker source must deliver exactly the rows the
    batch reader produces for the same configuration — across multiple
    micro-batches (bars_per_batch < periods forces several) — and a
    restarted drain must deliver nothing new (offsets checkpointed)."""
    from big_data_pipeline_spark.sources.ticker import register_ticker_source

    register_ticker_source(spark)
    out = str(tmp_path / "bars")
    ckpt = str(tmp_path / "ckpt")

    def drain(periods: int):
        q = (
            spark.readStream.format("ticker")
            .option("symbols", "AAPL,MSFT")
            .option("periods", str(periods))
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain(60)
    assert spark.read.parquet(out).count() == 120
    # history grew: the next drain resumes from the checkpointed offset
    # and ingests ONLY bars [60, 120) — incremental, not reload
    drain(120)
    got = spark.read.parquet(out)
    assert got.count() == 240
    # incremental catch-up == one-shot full reload (prefix-stable feed)
    out2, ckpt2 = str(tmp_path / "bars2"), str(tmp_path / "ckpt2")
    q = (
        spark.readStream.format("ticker")
        .option("symbols", "AAPL,MSFT")
        .option("periods", "120")
        .load()
        .writeStream.format("parquet")
        .option("path", out2)
        .option("checkpointLocation", ckpt2)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    full = spark.read.parquet(out2)
    assert full.count() == 240
    assert got.exceptAll(full).count() == 0
    assert full.exceptAll(got).count() == 0
    # batch read == stream drain for identical options (both backends
    # ride the same counter-based generator)
    batch = (
        spark.read.format("ticker")
        .option("symbols", "AAPL,MSFT")
        .option("periods", "120")
        .load()
    )
    assert batch.count() == 240
    assert batch.exceptAll(full).count() == 0
    assert full.exceptAll(batch).count() == 0
    # no new history: a replayed drain adds nothing (exactly-once)
    drain(120)
    assert spark.read.parquet(out).count() == 240


def test_jsonldir_sink_commits_atomically(spark, tmp_path):
    """Custom Python DataSource WRITER: parts publish via rename, the
    _SUCCESS manifest lands last and carries exact row/file counts."""
    import json
    import os

    from big_data_pipeline_spark.sources import register_jsonl_sink

    register_jsonl_sink(spark)
    target = str(tmp_path / "out")
    os.makedirs(target)
    df = spark.range(0, 1000).selectExpr(
        "id", "concat('u', CAST(id % 7 AS STRING)) AS tag"
    ).repartition(4)
    df.write.format("jsonldir").mode("append").option("path", target).save()

    manifest = json.loads(open(os.path.join(target, "_SUCCESS")).read())
    assert manifest["n_rows"] == 1000
    parts = [p for p in os.listdir(target) if p.startswith("part-")]
    assert sorted(parts) == manifest["files"]
    assert len(parts) == 4
    # no staging residue, and the data round-trips through a JSON scan
    assert not os.path.exists(os.path.join(target, "__staging"))
    back = spark.read.json(os.path.join(target, "part-*.jsonl"))
    assert back.count() == 1000
    assert back.selectExpr("sum(id)").collect()[0][0] == 499500


def test_jsonldir_sink_overwrite_replaces_parts(spark, tmp_path):
    import json
    import os

    from big_data_pipeline_spark.sources import register_jsonl_sink

    register_jsonl_sink(spark)
    target = str(tmp_path / "out2")
    os.makedirs(target)
    for n in (100, 10):
        (
            spark.range(0, n)
            .repartition(2)
            .write.format("jsonldir")
            .mode("overwrite")
            .option("path", target)
            .save()
        )
    manifest = json.loads(open(os.path.join(target, "_SUCCESS")).read())
    assert manifest["n_rows"] == 10
    back = spark.read.json(os.path.join(target, "part-*.jsonl"))
    assert back.count() == 10
    # overwrite removed every part of the previous generation — the
    # manifest and the directory agree exactly
    parts = [p for p in os.listdir(target) if p.startswith("part-")]
    assert sorted(parts) == manifest["files"]


def test_jsonldir_sink_append_merges_manifest(spark, tmp_path):
    """Append mode must not disown earlier generations: the manifest
    accumulates every committed part file and the total row count, so a
    manifest-trusting reader sees all rows, not just the last batch."""
    import json
    import os

    from big_data_pipeline_spark.sources import register_jsonl_sink

    register_jsonl_sink(spark)
    target = str(tmp_path / "out3")
    os.makedirs(target)
    for n in (100, 50):
        (
            spark.range(0, n)
            .repartition(2)
            .write.format("jsonldir")
            .mode("append")
            .option("path", target)
            .save()
        )
    manifest = json.loads(open(os.path.join(target, "_SUCCESS")).read())
    assert manifest["n_rows"] == 150
    parts = [p for p in os.listdir(target) if p.startswith("part-")]
    assert len(parts) == 4
    assert sorted(parts) == manifest["files"]
    # per-file counts are carried so future merges stay consistent
    assert sum(manifest["file_rows"].values()) == 150
    assert sorted(manifest["file_rows"]) == manifest["files"]
    back = spark.read.json(os.path.join(target, "part-*.jsonl"))
    assert back.count() == 150


def test_jsonldir_sink_append_drops_missing_part_counts(spark, tmp_path):
    """If a manifest-listed part is deleted out-of-band, the next append
    drops BOTH its name and its row count — _SUCCESS's n_rows never
    overcounts relative to its own files list (per-file counts make the
    missing part's contribution apportionable)."""
    import json
    import os

    from big_data_pipeline_spark.sources import register_jsonl_sink

    register_jsonl_sink(spark)
    target = str(tmp_path / "out4")
    os.makedirs(target)
    (
        spark.range(0, 100)
        .repartition(2)
        .write.format("jsonldir")
        .mode("append")
        .option("path", target)
        .save()
    )
    manifest = json.loads(open(os.path.join(target, "_SUCCESS")).read())
    victim = manifest["files"][0]
    victim_rows = manifest["file_rows"][victim]
    os.remove(os.path.join(target, victim))
    (
        spark.range(0, 50)
        .repartition(2)
        .write.format("jsonldir")
        .mode("append")
        .option("path", target)
        .save()
    )
    merged = json.loads(open(os.path.join(target, "_SUCCESS")).read())
    assert victim not in merged["files"]
    assert merged["n_rows"] == 150 - victim_rows
    assert sum(merged["file_rows"].values()) == merged["n_rows"]
    back = spark.read.json(os.path.join(target, "part-*.jsonl"))
    assert back.count() == merged["n_rows"]


def test_jsonldir_legacy_manifest_missing_part_refuses_typed(tmp_path):
    """A legacy (aggregate-only) manifest with a missing part must abort
    the commit with the dedicated InconsistentManifestError — not a bare
    OSError that transient-read handling could silently swallow."""
    import json
    import os

    import pytest

    from big_data_pipeline_spark.sources.jsonl_sink import (
        InconsistentManifestError,
        _JsonlDirWriter,
    )

    target = str(tmp_path / "legacy")
    os.makedirs(target)
    # legacy manifest: files + aggregate n_rows, NO file_rows map, and
    # one listed part absent on disk → the count cannot be apportioned.
    with open(os.path.join(target, "_SUCCESS"), "w") as f:
        json.dump({"n_rows": 42, "files": ["part-gone.jsonl"]}, f)
    writer = _JsonlDirWriter({"path": target}, overwrite=False)
    with pytest.raises(InconsistentManifestError):
        writer.commit([])
    assert issubclass(InconsistentManifestError, RuntimeError)
    assert not issubclass(InconsistentManifestError, OSError)
