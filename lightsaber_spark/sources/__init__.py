from lightsaber_spark.sources.readers import (
    kafka_source,
    rate_source,
    read_table,
    socket_source,
)
from lightsaber_spark.sources.sinks import (
    memory_sink,
    noop_sink,
    to_files,
)
from lightsaber_spark.sources.partitioning import assert_partition_pruned

__all__ = [
    "read_table",
    "kafka_source",
    "rate_source",
    "socket_source",
    "to_files",
    "memory_sink",
    "noop_sink",
    "assert_partition_pruned",
]
