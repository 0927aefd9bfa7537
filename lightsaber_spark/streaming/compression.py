"""Streaming adaptive compression re-planning — the reference's
``CompressionMonitor`` loop (``src/monitors/CompressionMonitor.cpp``:
a monitor thread recomputes per-column statistics on the live stream
and re-decides the generated compressor when they drift) as a
``foreachBatch`` sink: every micro-batch runs the SAME relational
codec decision (:func:`lightsaber_spark.functions.compression.
compression_plan`) on its own rows and appends the plan to a durable
codec log, partitioned by ``_batch_id`` with dynamic partition
overwrite — so a replayed micro-batch (checkpoint recovery) overwrites
its own plan instead of duplicating it (the rollup sink's
exactly-once pattern, ``streaming/rollup.py``).

Codec-FLIP events (the monitor's actionable output: "switch column c
from RLE to dictionary") are derived from the log by one tiny window
over plan rows — O(batches × columns), never data-sized.

The batch twin is :func:`lightsaber_spark.functions.compression.
compression_replan` (registered as ``adaptive_compression_replan``
with a bit-exact DuckDB oracle): segmenting the ordered batch relation
at the same boundaries as the micro-batches reproduces this log row
for row, which is what the equivalence pytest pins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from lightsaber_spark.functions.compression import compression_plan


def continuous_compression_replan(
    stream: DataFrame,
    cols: list[str],
    order_col: str,
    out_path: str,
    checkpoint_dir: str,
    chunk_rows: int = 1 << 16,
):
    """Start an availableNow foreachBatch query appending each
    micro-batch's codec plan to ``out_path`` (parquet codec log,
    partitioned by ``_batch_id``). Returns the StreamingQuery; await
    it, then read flips with :func:`codec_flips`."""

    def _write_batch(batch_df: DataFrame, batch_id: int) -> None:
        plan = compression_plan(batch_df, cols, order_col, chunk_rows).withColumn(
            "_batch_id", F.lit(int(batch_id))
        )
        # per-write option, NOT session conf: mutating the session-global
        # partitionOverwriteMode inside foreachBatch would leak dynamic
        # mode into any concurrent overwrite in the same session (and the
        # restore would clobber a concurrent setter)
        (
            plan.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch_id")
            .parquet(out_path)
        )

    return (
        stream.writeStream.foreachBatch(_write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def codec_log(spark: SparkSession, out_path: str) -> DataFrame:
    """The maintained codec log: one row per (micro-batch, column) with
    the per-batch winning codec, plus ``flipped`` — identical shape to
    the batch :func:`compression_replan` output (``_batch_id`` plays
    ``batch_seq``)."""
    log = spark.read.parquet(out_path)
    w = Window.partitionBy("column_name").orderBy("_batch_id")
    prev = F.lag("codec").over(w)
    return log.select(
        F.col("_batch_id").cast("bigint").alias("batch_seq"),
        "column_name",
        "codec",
        "est_bits",
        "plain_bits",
        F.when(prev.isNotNull() & (prev != F.col("codec")), F.lit(1))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("flipped"),
    )


def codec_flips(spark: SparkSession, out_path: str) -> DataFrame:
    """Codec-flip events from the log: ``(batch_seq, column_name,
    prev_codec, codec)`` — one row per re-decision, the streaming
    monitor's actionable output."""
    log = spark.read.parquet(out_path)
    w = Window.partitionBy("column_name").orderBy("_batch_id")
    prev = F.lag("codec").over(w)
    return (
        log.select(
            F.col("_batch_id").cast("bigint").alias("batch_seq"),
            "column_name",
            prev.alias("prev_codec"),
            "codec",
        )
        .filter(F.col("prev_codec").isNotNull() & (F.col("prev_codec") != F.col("codec")))
    )
