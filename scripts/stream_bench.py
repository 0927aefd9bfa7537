#!/usr/bin/env python
"""Streaming throughput smoke: measured tuples/s through the streaming
engine on local[32], using the repo's own instrumentation
(`monitoring.ThroughputListener` — the reference's [MON] analog) over
the bounded-batch rate source (`rate_micro_batch_source` — the
ring-buffer-ingest analog).

The reference's benchmarks are throughput-based (tuples/s per node);
BASELINE.md records no absolute numbers, so this artifact documents
OUR side with honest context: JVM + Python driver, micro-batch
scheduling overhead included, state-store windowed aggregation — not a
cache-resident C++ JIT loop. The interesting property is the SHAPE:
per-batch cost should be dominated by rows (throughput roughly flat as
rows/batch grows), and grouped windowed aggregation should sustain
millions of tuples/s on 32 cores.

Usage: python scripts/stream_bench.py [--rows-per-batch 1000000]
       [--batches 12] [--write STREAM_BENCH.md]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _measure(spark, name: str, make_stream, batches: int) -> dict:
    from lightsaber_spark.monitoring import ThroughputListener

    listener = ThroughputListener()
    spark.streams.addListener(listener)
    q = (
        make_stream()
        .writeStream.format("noop")
        .option("checkpointLocation", f"/tmp/stream_bench_ck/{name}-{time.time_ns()}")
        .start()
    )
    try:
        while len(listener.metrics) < batches:
            time.sleep(0.2)
    finally:
        # stopping aborts the in-flight batch — the CANNOT_COMMIT /
        # NoopStreamingWrite-abort ERRORs it logs are expected noise,
        # not a failure: the measured batches all committed.
        q.stop()
        spark.streams.removeListener(listener)
    # drop the first two batches (codegen + state-store warmup)
    steady = [m for m in listener.metrics[2:batches] if m.num_input_rows > 0]
    rows = sum(m.num_input_rows for m in steady)
    secs = sum(
        m.duration_ms.get("triggerExecution", 0) for m in steady
    ) / 1000.0
    return {
        "rows": rows,
        "secs": round(secs, 3),
        "rows_per_sec": round(rows / secs) if secs else None,
        "batches_measured": len(steady),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows-per-batch", type=int, default=1_000_000)
    ap.add_argument("--batches", type=int, default=12)
    ap.add_argument("--write", default=None)
    ap.add_argument("--rocksdb", action="store_true",
                    help="use the RocksDB state-store provider instead "
                         "of the default HDFS-backed one")
    ap.add_argument("--shapes", default=None,
                    help="comma-separated subset of shapes to run "
                         "(default: all) — used by the batch-size sweep")
    ap.add_argument("--append", action="store_true",
                    help="append rows to --write instead of rewriting")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from lightsaber_spark import get_spark
    from lightsaber_spark.sources.readers import rate_micro_batch_source
    from lightsaber_spark.streaming.stream import streaming_windowed_agg

    spark = get_spark(app_name="stream-bench")
    spark.sparkContext.setLogLevel("ERROR")
    if args.rocksdb:
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )

    def base(rows_per_batch: int | None = None):
        # start away from epoch 0 (initial-watermark gotcha, CLAUDE.md)
        s = rate_micro_batch_source(
            spark,
            rows_per_batch=rows_per_batch or args.rows_per_batch,
            num_partitions=32,
            start_timestamp_ms=100_000,
            advance_ms_per_batch=1000,
        )
        return s.select(
            F.col("timestamp").alias("ts"),
            (F.col("value") % 10).alias("key"),
            (F.col("value") % 1000).cast("double").alias("v"),
        )

    # Stream-stream theta join (SURVEY §3.3's second data path): two
    # rate streams, event time spread across a 600 s band domain so
    # each ±5 s join band holds a bounded row set, with a selective
    # residual theta predicate (value mod 1009 equality) — the
    # reference ThetaJoin benchmark shape (selective predicate over a
    # symmetric time window). Smaller batches: per-batch cost is the
    # in-band pair scan, not row ingest.
    def theta_side(rows_per_batch: int, alias: str):
        s = rate_micro_batch_source(
            spark,
            rows_per_batch=rows_per_batch,
            num_partitions=32,
            start_timestamp_ms=100_000,
            advance_ms_per_batch=1000,
        )
        return s.select(
            F.timestamp_millis(
                F.unix_millis(F.col("timestamp"))
                + (F.col("value") * 7) % 600_000
            ).alias(f"{alias}_ts"),
            F.col("value").alias(f"{alias}_v"),
        )

    def theta_shape():
        from lightsaber_spark.streaming.stream import streaming_theta_join

        n = max(args.rows_per_batch // 10, 10_000)
        left = theta_side(n, "l")
        right = theta_side(n, "r")
        return streaming_theta_join(
            left, right,
            (F.col("l_v") % 1009) == (F.col("r_v") % 1009),
            "l_ts", "r_ts", max_delta_sec=5, watermark="10 seconds",
        )

    def session_shape():
        from lightsaber_spark.streaming.sessions import session_window_agg

        # spread event time so sessions (30 s gap) actually close; the
        # watermark lets the state store evict closed sessions
        s = base().withColumn(
            "ts",
            F.timestamp_millis(
                F.unix_millis(F.col("ts")) + (F.col("v").cast("bigint") * 101) % 300_000
            ),
        ).withWatermark("ts", "10 seconds")
        return session_window_agg(
            s, "ts", 30, [("sum", "v", "sum_v"), ("count", None, "n")], ["key"]
        )

    # theta shape feeds max(rows_per_batch//10, 10k) rows per SIDE —
    # its real per-batch ingest (both sides) differs from the global
    # --rows-per-batch and must be reported per shape, not globally
    theta_rows_per_batch = 2 * max(args.rows_per_batch // 10, 10_000)
    shapes = {
        # pure ingest+project: the data-movement ceiling (NoOp analog)
        "passthrough": (lambda: base(), args.rows_per_batch),
        # CM1 shape: tumbling grouped sum+count, state-store windowed agg
        "tumbling_sum_60s": (lambda: streaming_windowed_agg(
            base(), "ts", 60, None,
            [("sum", "v", "sum_v"), ("count", None, "n")], ["key"],
            watermark="10 seconds",
        ), args.rows_per_batch),
        # sliding (60,10): native window fan-out x6 + state
        "sliding_sum_60_10": (lambda: streaming_windowed_agg(
            base(), "ts", 60, 10,
            [("sum", "v", "sum_v")], ["key"],
            watermark="10 seconds",
        ), args.rows_per_batch),
        # stream-stream theta join (band-bucketized symmetric hash join
        # + residual predicate) — rows/s counts BOTH input sides
        "theta_join_band_5s": (theta_shape, theta_rows_per_batch),
        # session windows (30 s gap) over spread event time
        "session_windows_30s": (session_shape, args.rows_per_batch),
    }
    if args.shapes:
        wanted = args.shapes.split(",")
        shapes = {n: shapes[n] for n in wanted}
    results = {}
    for name, (mk, per_batch) in shapes.items():
        results[name] = _measure(spark, name, mk, args.batches)
        results[name]["rows_per_batch"] = per_batch
        r = results[name]
        print(
            f"{name:20s} {r['rows']:>10} rows in {r['secs']:6.2f}s steady "
            f"-> {r['rows_per_sec']:>10} rows/s"
        )

    provider = "rocksdb" if args.rocksdb else "hdfs-backed"
    payload = {
        "rows_per_batch": args.rows_per_batch,
        "cores": 32,
        "provider": provider,
        "results": results,
    }
    if args.append and os.path.exists("STREAM_BENCH.json"):
        with open("STREAM_BENCH.json") as f:
            prior = json.load(f)
        prior = prior if isinstance(prior, list) else [prior]
        prior.append(payload)
        payload = prior
    with open("STREAM_BENCH.json", "w") as f:
        json.dump(payload, f)
    if args.write:
        lines = [] if args.append else [
            "# Streaming throughput smoke "
            "(generated by scripts/stream_bench.py — do not edit)",
            "",
            "`rate-micro-batch` source, 32 partitions on local[32]; "
            "steady-state batches only (first two dropped); measured by "
            "the repo's own `ThroughputListener` (the reference's [MON] "
            "analog, `Measurement.cpp:42-54`). Honest context: JVM "
            "micro-batch engine with state-store windowed aggregation — "
            "scheduling overhead included, not a cache-resident C++ JIT "
            "loop; the reference publishes no absolute numbers in-repo "
            "(BASELINE.md), so these document our absolute single-node "
            "streaming rates. The rows/batch sweep shows the micro-batch "
            "cost model directly: per-batch scheduling + state-commit "
            "overhead is ~fixed, so throughput scales with batch size "
            "(the throughput/latency trade micro-batching makes) — the "
            "per-ROW cost of the windowed aggregation itself is the "
            "8M-rows/batch row.",
            "",
            "| shape | state store | rows/batch | steady rows/s | rows | steady secs |",
            "|---|---|---|---|---|---|",
        ]
        for name, r in results.items():
            lines.append(
                f"| {name} | {provider} | {r['rows_per_batch']:,} "
                f"| {r['rows_per_sec']:,} "
                f"| {r['rows']:,} | {r['secs']} |"
            )
        with open(args.write, "a" if args.append else "w") as f:
            f.write("\n".join(lines) + "\n")
        print(f"wrote {args.write}")
    spark.stop()


if __name__ == "__main__":
    main()
