"""Sinks.

Reference inventory (SURVEY.md §2.6): in-process forwarding to the
downstream query (→ DataFrame lineage, nothing to build), TCP sink
(→ ``writeStream`` to kafka/console/memory/foreachBatch), RDMA (out of
scope). Batch-side we add the standard lake writers with the layout
controls that matter at 100 TB (partitioning, bucketing, target file
count).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def to_files(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: Sequence[str] = (),
    max_records_per_file: int | None = None,
    **options: str,
) -> None:
    """Write a DataFrame to a file sink with scale-relevant layout
    knobs: ``partition_by`` for partition pruning on read,
    ``max_records_per_file`` to bound file sizes (small-file storms and
    2 GB monsters are both read-side hazards)."""
    w = df.write.format(fmt).mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if max_records_per_file is not None:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    for k, v in options.items():
        w = w.option(k, v)
    w.save(path)


def noop_sink(df: DataFrame) -> None:
    """Full execution, nothing materialized — the measurement sink
    (bench.py uses this; mirrors how the reference benchmarks measure
    operator throughput without an output path)."""
    df.write.format("noop").mode("overwrite").save()


def memory_sink(stream_df: DataFrame, name: str, checkpoint: str, output_mode: str = "append"):
    """Streaming memory sink (test/debug): returns the started query;
    read results via ``spark.table(name)``."""
    return (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def to_kafka_frame(
    df: DataFrame,
    key_col: str | None = None,
    value_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Project any DataFrame onto the Kafka wire schema the sink
    requires (``key``/``value`` strings): value = JSON of
    ``value_cols`` (default: every non-key column), key = ``key_col``
    cast to string (key-hash partitioning → per-key ordering in the
    topic). Split out of :func:`kafka_sink` so the serialization is
    testable without a broker — the same split as
    ``readers.parse_kafka_value`` on the source side."""
    from pyspark.sql import functions as F

    # `is None`, not truthiness: an explicit empty selection must error
    # rather than silently fall back to publishing EVERY column (r12
    # review — a dynamically built list that filters to [] would leak
    # unintended fields to the topic)
    if value_cols is not None and not list(value_cols):
        raise ValueError("value_cols is empty — nothing to serialize")
    cols = (
        list(value_cols)
        if value_cols is not None
        else [c for c in df.columns if c != key_col]
    )
    out = df.select(
        *([F.col(key_col).cast("string").alias("key")] if key_col else []),
        F.to_json(F.struct(*[F.col(c) for c in cols])).alias("value"),
    )
    return out


def kafka_sink(
    stream_df: DataFrame,
    bootstrap_servers: str,
    topic: str,
    checkpoint: str,
    key_col: str | None = None,
    value_cols: Sequence[str] | None = None,
    output_mode: str = "append",
    **options: str,
):
    """Network sink — the production analog of the reference's TCP
    result forwarding (``ResultHandler.h:108-111``, ``ResultHandler
    .cpp:73``): serialize to the Kafka wire frame and start a
    ``writeStream`` to the topic. Delivery is AT-LEAST-ONCE: after a
    failure the checkpoint replays the in-flight batch, so a batch can
    be re-published (never lost) — consumers dedupe on key for
    effective exactly-once.
    Requires the spark-sql-kafka connector jar (absent in this
    container; wiring is exercised by resolution tests)."""
    frame = to_kafka_frame(stream_df, key_col, value_cols)
    writer = (
        frame.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
        .outputMode(output_mode)
    )
    for k, v in options.items():
        writer = writer.option(k, v)
    return writer.start()


def socket_sink(
    stream_df: DataFrame,
    host: str,
    port: int,
    checkpoint: str,
    output_mode: str = "append",
    trigger_available_now: bool = False,
):
    """Line-oriented TCP sink via ``foreachBatch`` — the direct analog
    of the reference's single-socket TCP result forwarder
    (``ResultHandler.cpp:73``: one connection, rows serialized in
    order). One JSON line per row. Like the reference's, this funnels
    through ONE connection, so rows stream through the driver
    (``toLocalIterator`` — bounded memory, one partition in flight);
    it is a bridge/debug sink — the scale path is :func:`kafka_sink`.
    Delivery is at-least-once under retries (same as a raw socket)."""
    import socket as socketlib

    def _send(batch_df: DataFrame, batch_id: int) -> None:
        with socketlib.create_connection((host, port)) as sock:
            w = sock.makefile("w", encoding="utf-8")
            for row in batch_df.toJSON().toLocalIterator():
                w.write(row)
                w.write("\n")
            w.flush()

    writer = (
        stream_df.writeStream.foreachBatch(_send)
        .option("checkpointLocation", checkpoint)
        .outputMode(output_mode)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def upsert_batch_sink(
    stream_df: DataFrame,
    path: str,
    checkpoint: str,
    output_mode: str = "update",
    trigger_available_now: bool = False,
):
    """Bridge an UPDATE-mode stateful stream onto an append-only file
    sink, idempotently: each micro-batch lands in its own
    ``_batch=<id>`` partition with overwrite, so a replayed batch
    (restart after failure) overwrites itself instead of duplicating —
    effective exactly-once on top of at-least-once foreachBatch, the
    Scabbard role (``FileBackedCheckpointCoordinator.h:34-42``) for
    sinks Spark can't transact against. Read the final state back with
    :func:`read_upsert_state`."""

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        # the batch id lives in the DIRECTORY name only (partition
        # discovery surfaces it as a column on read — carrying it in
        # the data too would collide at read time)
        batch_df.write.mode("overwrite").parquet(f"{path}/_batch={batch_id}")

    writer = (
        stream_df.writeStream.foreachBatch(_write)
        .option("checkpointLocation", checkpoint)
        .outputMode(output_mode)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_upsert_state(spark, path: str, keys: Sequence[str]) -> DataFrame:
    """Reconstruct the latest value per key from an
    :func:`upsert_batch_sink` directory: max-``_batch`` row wins (an
    update-mode stream re-emits a key only when its value changed)."""
    from pyspark.sql import Window, functions as F

    df = spark.read.option("basePath", path).parquet(f"{path}/_batch=*")
    w = Window.partitionBy(*keys).orderBy(F.col("_batch").desc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_batch")
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    key_col: str = "doc_id",
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Deterministic sharded corpus export — the hand-off format for
    training data loaders: shard = 60-bit md5 of the key mod
    ``n_shards`` (stable across retries, cluster sizes, and reruns —
    NEVER partition- or RNG-derived), rows sorted by key within each
    shard, one file per shard.

    Layout mechanics: ``repartitionByRange`` on the shard id gives
    ~one shard value per task (AQE-independent), ``partitionBy`` lays
    each shard in its own directory for pruned reads, and the
    within-partition sort makes file contents reproducible
    byte-for-byte. One shuffle total.
    """
    from pyspark.sql import functions as F

    if n_shards <= 0:
        raise ValueError("n_shards must be positive")
    shard = (
        F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 15), 16, 10)
        .cast("bigint") % n_shards
    )
    # md5(NULL) is NULL → a NULL key would land in Hive's default
    # partition OUTSIDE the promised shard=0..n-1 layout, silently
    # invisible to a loader enumerating shards (review finding). NULL
    # keys are deterministically routed to shard 0 instead.
    shard = F.coalesce(shard, F.lit(0).cast("bigint"))
    out = (
        df.withColumn("shard", shard)
        .repartitionByRange(n_shards, "shard")
        .sortWithinPartitions("shard", key_col)
    )
    out.write.format(fmt).mode(mode).partitionBy("shard").save(path)
