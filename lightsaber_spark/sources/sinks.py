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
    out = (
        df.withColumn("shard", shard)
        .repartitionByRange(n_shards, "shard")
        .sortWithinPartitions("shard", key_col)
    )
    out.write.format(fmt).mode(mode).partitionBy("shard").save(path)
