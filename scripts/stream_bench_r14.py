#!/usr/bin/env python
"""Round-14 streaming measurement: the LRB3 two-stage DAG under
writeStream (stage-1 hourly windowed count per user → exactly-once
parquet bridge → stage-2 global row windows of 256), the streaming
twin pinned correct by test_streaming_two_stage_dag_matches_batch_
with_restart. Prints per-stage wall time and throughput after the
pipeline drains; results are copied into STREAM_BENCH.md by hand.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

TMP = "/tmp/ls_r14_stream_bench"


def main() -> None:
    import datetime as dt

    from pyspark.sql import functions as F

    from lightsaber_spark import get_spark
    from lightsaber_spark.streaming import read_stream
    from lightsaber_spark.streaming.row_windows import streaming_row_window_agg
    from lightsaber_spark.streaming.stream import streaming_windowed_agg

    shutil.rmtree(TMP, ignore_errors=True)
    os.makedirs(TMP)
    spark = get_spark(app_name="r14-stream-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # 8 micro-batches x 500K events, 5000 users, one hour per batch:
    # stage-1 output = 5000 (window, user) rows per closed hour
    n_users, per_batch, batches = 5000, 500_000, 8
    t0 = int(dt.datetime(2024, 1, 1).timestamp()) * 1_000_000
    src, mid, out = f"{TMP}/src", f"{TMP}/bridge", f"{TMP}/final"

    for b in range(batches):
        (
            spark.range(per_batch)
            .select(
                F.timestamp_micros(
                    F.lit(t0)
                    + F.lit(b * 3_600_000_000)
                    + (F.col("id") * (3_600_000_000 // per_batch))
                ).alias("ts"),
                (F.col("id") % n_users).alias("user_id"),
            )
            .coalesce(2)
            .write.mode("append")
            .parquet(src)
        )
        time.sleep(1.05)  # distinct mtimes → deterministic replay order

    # warm the python worker + codegen paths outside the timed region
    spark.read.parquet(src).groupBy("user_id").count().write.format(
        "noop"
    ).mode("overwrite").save()

    t1 = time.time()
    s1 = streaming_windowed_agg(
        read_stream(spark, src, "ts timestamp, user_id bigint",
                    max_files_per_trigger=2),
        "ts", 3600, None, [("count", None, "n")], ["user_id"],
    )
    q1 = (
        s1.writeStream.format("parquet")
        .option("path", mid)
        .option("checkpointLocation", f"{TMP}/ck1")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q1.awaitTermination()
    stage1_s = time.time() - t1
    n_in = batches * per_batch
    n_mid = spark.read.parquet(mid).count()

    t2 = time.time()
    s2 = streaming_row_window_agg(
        read_stream(spark, mid, "window_start bigint, user_id bigint, n bigint",
                    max_files_per_trigger=64),
        ["window_start", "user_id"], 256,
        [("count", None, "n_rows"), ("sum", "n", "total_events")],
        keys=[],
    )
    q2 = (
        s2.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", f"{TMP}/ck2")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination()
    stage2_s = time.time() - t2
    n_out = spark.read.parquet(out).count()

    print(
        f"stage1 (windowed agg -> bridge): {n_in} events in {stage1_s:.1f}s "
        f"= {n_in / stage1_s / 1000:.0f}K events/s; bridge rows {n_mid}"
    )
    print(
        f"stage2 (row windows of 256):     {n_mid} rows in {stage2_s:.1f}s "
        f"= {n_mid / stage2_s / 1000:.1f}K rows/s; windows {n_out}"
    )
    print(f"total wall {stage1_s + stage2_s:.1f}s for {n_in} events end-to-end")
    spark.stop()


if __name__ == "__main__":
    main()
