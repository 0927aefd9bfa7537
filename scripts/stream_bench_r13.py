#!/usr/bin/env python
"""Round-13 streaming measurements: the two new streaming ops.

1. streaming_url_canonical_dedup — stateful dropDuplicates on the
   canonical URL over a synthesized crawl stream (pure-Catalyst
   canonicalization + JVM state store; expect high throughput).
2. continuous_compression_replan — per-micro-batch codec re-decision
   over a wide events-like stream (one grouped agg + window per batch
   via foreachBatch).

Prints per-batch rows + seconds from StreamingQuery progress (or wall
time for the foreachBatch sink) after a discarded warm-up batch.
Results are copied into STREAM_BENCH.md's round-13 section by hand.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

TMP = "/tmp/ls_r13_stream_bench"


def main() -> None:
    from pyspark.sql import functions as F

    from lightsaber_spark import get_spark
    from lightsaber_spark.streaming import read_stream

    shutil.rmtree(TMP, ignore_errors=True)
    os.makedirs(TMP)
    spark = get_spark(app_name="r13-stream-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # ---------------- URL dedup shape: 5 x 200K-URL micro-batches,
    # ~50 % cross-batch duplicate spellings (re-crawl mix)
    n, batches = 200_000, 5
    src = f"{TMP}/urls_src"
    base = spark.range(n).select(
        F.col("id").alias("visit_id"),
        F.concat(
            F.when(F.col("id") % 2 == 0, F.lit("https://www.")).otherwise(
                F.lit("http://")
            ),
            F.lit("site"),
            (F.col("id") % 100_000).cast("string"),  # 50% dup pages
            F.when(F.col("id") % 3 == 0, F.lit(".co.uk/p/")).otherwise(
                F.lit(".com/p/")
            ),
            (F.col("id") % 1000).cast("string"),
            F.when(F.col("id") % 5 == 0, F.lit("?utm_source=x")).otherwise(
                F.lit("")
            ),
        ).alias("url"),
    )
    for b in range(batches):
        base.withColumn(
            "visit_id", F.col("visit_id") + F.lit(b * n)
        ).coalesce(4).write.mode("append").parquet(src)
        time.sleep(1.1)

    from lightsaber_spark.streaming.stream import streaming_url_canonical_dedup

    stream = read_stream(
        spark, src, spark.read.parquet(src).schema, max_files_per_trigger=4
    )
    q = (
        streaming_url_canonical_dedup(stream, "url", "visit_id")
        .writeStream.format("noop")
        .option("checkpointLocation", f"{TMP}/ck_urls")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    print("## streaming_url_canonical_dedup (200K urls/batch, 50% dups)")
    for p in q.recentProgress:
        rows = p["numInputRows"]
        if not rows:
            continue
        sec = p["batchDuration"] / 1000.0
        print(
            f"batch {p['batchId']}: {rows} rows in {sec:.2f}s "
            f"= {rows / sec:,.0f} urls/s"
        )

    # ---------------- compression replan shape: 4 x 1M-row batches,
    # 4 bigint columns (id/user/value/typehash-like)
    n2, batches2 = 1_000_000, 4
    src2 = f"{TMP}/comp_src"
    wide = spark.range(n2).select(
        F.col("id").alias("ord"),
        (F.col("id") % 50_000).alias("user_id"),
        (F.col("id") * 37 % 1_000_000).alias("value_c"),
        (F.col("id") % 150).alias("type_h"),
    )
    for b in range(batches2):
        wide.withColumn("ord", F.col("ord") + F.lit(b * n2)).coalesce(
            4
        ).write.mode("append").parquet(src2)
        time.sleep(1.1)

    from lightsaber_spark.streaming.compression import (
        continuous_compression_replan,
    )

    stream2 = read_stream(
        spark, src2, spark.read.parquet(src2).schema, max_files_per_trigger=4
    )
    t0 = time.time()
    q2 = continuous_compression_replan(
        stream2,
        ["user_id", "value_c", "type_h"],
        "ord",
        f"{TMP}/codec_log",
        f"{TMP}/ck_comp",
    )
    q2.awaitTermination()
    print("## continuous_compression_replan (1M rows x 3 cols per batch)")
    for p in q2.recentProgress:
        rows = p["numInputRows"]
        if not rows:
            continue
        sec = p["batchDuration"] / 1000.0
        print(
            f"batch {p['batchId']}: {rows} rows in {sec:.2f}s "
            f"= {rows / sec:,.0f} rows/s"
        )
    print(f"total wall {time.time() - t0:.1f}s")
    spark.stop()


if __name__ == "__main__":
    main()
