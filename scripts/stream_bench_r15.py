#!/usr/bin/env python
"""Round-15 streaming measurement: keyed vs global
``streaming_gapfill_tumbling`` (r14 verdict #4). Same event volume,
same planted multi-window silences; the global form funnels all state
through ONE python partition (the documented round-8 class), the
keyed form shards state by key hash — the 100 TB deployment shape.
Prints wall time + throughput for both; results copied into
STREAM_BENCH.md by hand.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

TMP = "/tmp/ls_r15_stream_bench"


def main() -> None:
    from pyspark.sql import functions as F

    from lightsaber_spark import get_spark
    from lightsaber_spark.streaming import read_stream
    from lightsaber_spark.streaming.gapfill import streaming_gapfill_tumbling

    shutil.rmtree(TMP, ignore_errors=True)
    os.makedirs(TMP)
    spark = get_spark(app_name="r15-stream-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # 6 micro-batches x 500K events over 64 keys; each batch advances
    # one hour except batch 3, which jumps 50 hours — a 49-window
    # silence EVERY key must drain by watermark+timeout alone
    n_keys, per_batch, batches = 64, 2_000_000, 4
    src = f"{TMP}/src"
    base = 1_700_000_000
    hours = [0, 1, 51, 52]
    for b in range(batches):
        t0 = base + hours[b] * 3600
        (
            spark.range(per_batch)
            .select(
                (F.col("id") % n_keys).cast("string").alias("uid"),
                F.timestamp_seconds(
                    F.lit(t0) + (F.col("id") % 3600)
                ).alias("ts"),
                (F.col("id") % 1000).cast("bigint").alias("value_c"),
            )
            .coalesce(1)
            .write.mode("append")
            .parquet(src)
        )
        time.sleep(1.1)

    total = per_batch * batches

    def run(tag: str, keys):
        out, ck = f"{TMP}/out_{tag}", f"{TMP}/ck_{tag}"
        stream = read_stream(
            spark, src, "uid string, ts timestamp, value_c bigint",
            max_files_per_trigger=1,
        )
        t0 = time.time()
        q = (
            streaming_gapfill_tumbling(
                stream, "ts", 3600, "value_c", keys=keys
            )
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        dt_s = time.time() - t0
        rows = spark.read.parquet(out).count()
        zeros = spark.read.parquet(out).filter("n = 0").count()
        print(
            f"{tag}: {dt_s:.1f}s  {total / dt_s / 1000:.0f}K events/s  "
            f"{rows} windows emitted ({zeros} empty)"
        )

    run("keyed64", ["uid"])
    run("global", [])


if __name__ == "__main__":
    main()
