from lightsaber_spark.sources.readers import (
    kafka_source,
    rate_micro_batch_source,
    rate_source,
    read_table,
    socket_source,
)
from lightsaber_spark.sources.sinks import (
    kafka_sink,
    memory_sink,
    noop_sink,
    read_upsert_state,
    socket_sink,
    to_files,
    to_kafka_frame,
    upsert_batch_sink,
    write_training_shards,
)
from lightsaber_spark.sources.partitioning import assert_partition_pruned

__all__ = [
    "read_table",
    "kafka_source",
    "rate_source",
    "rate_micro_batch_source",
    "socket_source",
    "to_files",
    "memory_sink",
    "noop_sink",
    "kafka_sink",
    "to_kafka_frame",
    "socket_sink",
    "upsert_batch_sink",
    "read_upsert_state",
    "write_training_shards",
    "assert_partition_pruned",
]
