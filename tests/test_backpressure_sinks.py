"""Backpressure (bounded trigger ingest) + network sink helpers.

Reference semantics under test: ingest is bounded per processing step
(``CircularQueryBuffer.h:35-54`` — a full ring blocks the producer),
and results forward to a network sink (``ResultHandler.h:108-111``
TCP sink). Spark-side: maxFilesPerTrigger/maxOffsetsPerTrigger bound
the micro-batch; kafka/socket sinks forward results; the foreachBatch
upsert bridge keeps exactly-once onto append-only files.
"""

from __future__ import annotations

import socket
import threading
import time

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR, rows_match


@pytest.fixture(scope="module")
def split_events_src(spark, tmp_path_factory):
    """Events as FOUR parquet files so a bounded trigger must take
    several micro-batches to drain them."""
    from lightsaber_spark.session import load_tables

    ev = load_tables(spark, SF_DIR, ("events",))["events"].limit(4000)
    path = str(tmp_path_factory.mktemp("bounded_src"))
    ev.repartition(4).write.mode("overwrite").parquet(path)
    back = spark.read.parquet(path)
    n_files = len([f for f in __import__("os").listdir(path) if f.endswith(".parquet")])
    assert n_files == 4
    return path, back.schema, back.count()


def _drain(q):
    q.awaitTermination()
    return [p for p in q.recentProgress if p["numInputRows"] > 0]


def test_bounded_trigger_processes_in_n_batches(spark, split_events_src, tmp_path):
    """maxFilesPerTrigger=1 over 4 files → 4 data micro-batches, and
    the final aggregate equals the unbounded (single-batch) run — the
    reference's ring-buffer invariant: bounding ingest changes batch
    boundaries, never results."""
    from lightsaber_spark.streaming import read_stream

    path, schema, n_rows = split_events_src

    def run(max_files, tag):
        stream = read_stream(spark, path, schema, max_files_per_trigger=max_files)
        agg = stream.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("sum_c"),
        )
        q = (
            agg.writeStream.format("memory")
            .queryName(f"bp_{tag}")
            .outputMode("complete")
            .option("checkpointLocation", str(tmp_path / f"ck_{tag}"))
            .trigger(availableNow=True)
            .start()
        )
        batches = _drain(q)
        return batches, spark.table(f"bp_{tag}").collect()

    bounded_batches, bounded = run(1, "bounded")
    unbounded_batches, unbounded = run(None, "unbounded")

    assert len(bounded_batches) == 4
    assert all(p["numInputRows"] <= n_rows // 4 for p in bounded_batches)
    assert len(unbounded_batches) == 1
    ok, msg = rows_match(bounded, unbounded)
    assert ok, msg


def test_bytes_bound_also_limits_batches(spark, split_events_src, tmp_path):
    """maxBytesPerTrigger admits ~one small file per batch (floors at
    one file), so the 4-file source still drains in >1 batch."""
    from lightsaber_spark.streaming import read_stream

    path, schema, n_rows = split_events_src
    stream = read_stream(
        spark, path, schema, max_files_per_trigger=None, max_bytes_per_trigger="1"
    )
    q = (
        stream.groupBy().count()
        .writeStream.format("memory")
        .queryName("bp_bytes")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck_bytes"))
        .trigger(availableNow=True)
        .start()
    )
    batches = _drain(q)
    assert len(batches) == 4  # 1-byte cap floors at one file per batch
    assert spark.table("bp_bytes").collect()[0][0] == n_rows


def test_rate_micro_batch_bounded_rows_per_trigger(spark, tmp_path):
    """rate-micro-batch emits EXACTLY rows_per_batch per trigger —
    deterministic bounded ingest, the CircularQueryBuffer capacity
    analog."""
    from lightsaber_spark.sources import rate_micro_batch_source

    src = rate_micro_batch_source(spark, rows_per_batch=7, num_partitions=1)
    q = (
        src.writeStream.format("memory")
        .queryName("bp_rate")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_rate"))
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            data = [p for p in q.recentProgress if p["numInputRows"] > 0]
            if len(data) >= 3:
                break
            time.sleep(0.5)
    finally:
        q.stop()
        q.awaitTermination()
    assert len(data) >= 3
    assert all(p["numInputRows"] == 7 for p in data)


def test_kafka_sink_frame_projection(spark):
    """The wire-format stage is a pure projection: key = key_col as
    string, value = JSON of the remaining columns (round-trips through
    the source-side parser)."""
    from lightsaber_spark.sources import to_kafka_frame
    from lightsaber_spark.sources.readers import parse_kafka_value

    df = spark.createDataFrame(
        [(7, "view", 1.5)], "user_id bigint, event_type string, value double"
    )
    frame = to_kafka_frame(df, key_col="user_id")
    assert frame.columns == ["key", "value"]
    row = frame.collect()[0]
    assert row.key == "7"
    raw = spark.createDataFrame(
        [(bytearray(row.value.encode()),)], "value binary"
    ).withColumn("timestamp", F.timestamp_micros(F.lit(1_700_000_000_000_000)))
    back = parse_kafka_value(raw, "event_type string, value double").collect()[0]
    assert (back.event_type, back.value) == ("view", 1.5)


def test_kafka_sink_wiring_reaches_resolution(spark, split_events_src, tmp_path):
    """Without the connector jar the sink must fail inside Spark's
    sink resolution (proving the writeStream wiring is correct), not
    in our code."""
    from lightsaber_spark.sources import kafka_sink
    from lightsaber_spark.streaming import read_stream

    path, schema, _n = split_events_src
    stream = read_stream(spark, path, schema)
    with pytest.raises(Exception, match="(?i)kafka"):
        q = kafka_sink(
            stream, "localhost:9092", "results", str(tmp_path / "ck_ks"),
            key_col="user_id",
        )
        try:
            q.awaitTermination(30)
        finally:
            q.stop()


class _LineServer(threading.Thread):
    """Accepts connections and collects newline-delimited payloads."""

    def __init__(self):
        super().__init__(daemon=True)
        self.sock = socket.create_server(("127.0.0.1", 0))
        self.port = self.sock.getsockname()[1]
        self.lines: list[str] = []
        self._halt = threading.Event()

    def run(self):
        self.sock.settimeout(0.5)
        buf = b""
        while not self._halt.is_set():
            try:
                conn, _ = self.sock.accept()
            except socket.timeout:
                continue
            with conn:
                while chunk := conn.recv(65536):
                    buf += chunk
        self.lines = [l for l in buf.decode().splitlines() if l]

    def stop(self):
        self._halt.set()
        self.join(timeout=10)
        self.sock.close()


def test_socket_sink_delivers_all_rows(spark, split_events_src, tmp_path):
    """End-to-end TCP forwarding (ResultHandler.cpp:73 analog): every
    input row arrives as one JSON line."""
    from lightsaber_spark.sources import socket_sink
    from lightsaber_spark.streaming import read_stream

    server = _LineServer()
    server.start()
    try:
        path, schema, n_rows = split_events_src
        stream = read_stream(spark, path, schema, max_files_per_trigger=2)
        q = socket_sink(
            stream.select("user_id", "event_type"),
            "127.0.0.1", server.port, str(tmp_path / "ck_sock"),
            trigger_available_now=True,
        )
        q.awaitTermination()
    finally:
        server.stop()
    assert len(server.lines) == n_rows
    assert all(l.startswith("{") for l in server.lines[:5])


def test_upsert_batch_sink_exactly_once_restart(spark, split_events_src, tmp_path):
    """Update-mode stateful agg → append-only parquet via the
    batch-id-partitioned upsert bridge: a restart from the same
    checkpoint re-applies nothing (replayed batches overwrite
    themselves), and the reconstructed latest-state equals the batch
    answer."""
    from lightsaber_spark.sources import read_upsert_state, upsert_batch_sink
    from lightsaber_spark.streaming import read_stream

    path, schema, _n = split_events_src
    out = str(tmp_path / "upsert_out")
    ck = str(tmp_path / "ck_upsert")

    def run_once():
        stream = read_stream(spark, path, schema, max_files_per_trigger=1)
        agg = stream.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("sum_c"),
        )
        q = upsert_batch_sink(agg, out, ck, trigger_available_now=True)
        q.awaitTermination()
        return spark.read.option("basePath", out).parquet(f"{out}/_batch=*").count()

    rows1 = run_once()
    rows2 = run_once()  # restart: input already committed → no new rows
    assert rows1 > 0
    assert rows2 == rows1

    got = read_upsert_state(spark, out, ["event_type"])
    want = (
        spark.read.parquet(path)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("sum_c"),
        )
    )
    ok, msg = rows_match(
        got.select("event_type", "n", "sum_c").collect(),
        want.select("event_type", "n", "sum_c").collect(),
    )
    assert ok, msg
