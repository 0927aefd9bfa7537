"""Batch + streaming sources.

Reference inventory (SURVEY.md §2.5): in-memory replay driver
(``test/benchmarks/applications/BenchmarkQuery.h:144-240``), direct
byte push (``QueryApplication::processData``), TCP socket source
(``remoteSource.cpp``), RDMA (out of scope), persistent replayable
buffers (Scabbard). Spark-side the same roles are covered by file
sources (batch + streaming replay — see ``streaming.read_stream``),
the rate source (synthetic benchmark feed), and the socket source;
the format layer (parquet/csv/json/orc) is what a 100 TB lake needs
regardless.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import StructType

_FORMATS = ("parquet", "csv", "json", "orc")


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: StructType | None = None,
    ts_nanos_cols: list[str] | None = None,
    **options: str,
) -> DataFrame:
    """Batch read of one table in any supported format.

    CSV defaults to header+inferSchema unless a schema is given (always
    pass a schema in production — inference scans the data twice).
    ``ts_nanos_cols`` normalizes bigint-nanosecond columns to
    TimestampType (µs), the same convention ``session.load_tables``
    applies to the events fixture.
    """
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {_FORMATS}")
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    elif fmt == "csv":
        options.setdefault("header", "true")
        options.setdefault("inferSchema", "true")
    for k, v in options.items():
        reader = reader.option(k, v)
    df = reader.load(path)
    for c in ts_nanos_cols or []:
        df = normalize_nanos_col(df, c)
    return df


def normalize_nanos_col(df: DataFrame, c: str) -> DataFrame:
    """bigint epoch-nanoseconds → TimestampType (exact integer µs,
    `div` truncating — documented limit for pre-epoch nanos). Same
    form as the inline loop in ``session.load_tables`` (deliberately
    NOT imported there: every registered query transits load_tables,
    so a shared import would stale the whole catalog's impl hashes
    for a cosmetic dedup — if this form ever changes, change both)."""
    if dict(df.dtypes).get(c) == "bigint":
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"{c} div 1000")))
    return df


def rate_source(
    spark: SparkSession,
    rows_per_second: int = 1000,
    num_partitions: int | None = None,
    ramp_up_time: str | None = None,
) -> DataFrame:
    """Synthetic benchmark stream: monotonically increasing ``value``
    with a ``timestamp`` column — the Spark analog of the reference's
    replay/generator drivers (``RandomDataGenerator.h:102-110``).
    ``rows_per_second`` is itself the ingest-rate bound; for a
    per-BATCH bound independent of wall clock use
    :func:`rate_micro_batch_source`."""
    reader = spark.readStream.format("rate").option(
        "rowsPerSecond", rows_per_second
    )
    if num_partitions is not None:
        reader = reader.option("numPartitions", num_partitions)
    if ramp_up_time is not None:
        reader = reader.option("rampUpTime", ramp_up_time)
    return reader.load()


def rate_micro_batch_source(
    spark: SparkSession,
    rows_per_batch: int,
    num_partitions: int | None = None,
    start_timestamp_ms: int | None = None,
    advance_ms_per_batch: int | None = None,
) -> DataFrame:
    """Deterministic bounded-batch feed: EXACTLY ``rows_per_batch``
    rows per trigger, regardless of wall clock — the direct analog of
    the reference's bounded ring-buffer ingest, where a full
    ``CircularQueryBuffer`` blocks the producer until the query drains
    it (``CircularQueryBuffer.h:35-54``: put → -1 + retry). Spark
    inverts the mechanism (the source admits a bounded batch per
    trigger instead of blocking the producer) but the invariant is the
    same: per-batch work is bounded no matter how fast data arrives."""
    reader = spark.readStream.format("rate-micro-batch").option(
        "rowsPerBatch", rows_per_batch
    )
    if num_partitions is not None:
        reader = reader.option("numPartitions", num_partitions)
    if start_timestamp_ms is not None:
        reader = reader.option("startTimestamp", start_timestamp_ms)
    if advance_ms_per_batch is not None:
        reader = reader.option("advanceMillisPerBatch", advance_ms_per_batch)
    return reader.load()


def kafka_source(
    spark: SparkSession,
    bootstrap_servers: str,
    topics: str,
    value_schema: StructType | str | None = None,
    starting_offsets: str = "latest",
    fail_on_data_loss: bool = True,
    max_offsets_per_trigger: int | None = None,
    min_offsets_per_trigger: int | None = None,
    **options: str,
) -> DataFrame:
    """Kafka stream source — the production replacement for the
    reference's remote transports (TCP ``remoteSource.cpp``, RDMA
    ``src/RDMA/*``): durable, replayable, partition-parallel ingestion.

    Returns the raw Kafka frame if ``value_schema`` is None, else the
    parsed value columns (``from_json`` over the UTF-8 value) plus the
    Kafka ``timestamp`` — ready for ``windowed_agg``. One Kafka
    partition maps to one Spark input partition; scale consumer
    parallelism by topic partition count, not executor count.

    Backpressure: ``max_offsets_per_trigger`` caps records admitted
    per micro-batch (split proportionally across topic partitions) —
    the bounded-ingest semantic of the reference's ring buffer
    (``CircularQueryBuffer.h:35-54``); without it a restart after
    downtime admits the full backlog as one giant batch.
    ``min_offsets_per_trigger`` batches up trickles (with
    ``maxTriggerDelay`` as the staleness bound).

    Requires the ``spark-sql-kafka`` connector on the classpath
    (``spark.jars.packages=org.apache.spark:spark-sql-kafka-0-10_2.13:
    <spark-version>``) — not bundled in this container, so this helper
    is exercised by plan-construction tests only.
    """
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topics)
        .option("startingOffsets", starting_offsets)
        .option("failOnDataLoss", str(fail_on_data_loss).lower())
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", max_offsets_per_trigger)
    if min_offsets_per_trigger is not None:
        reader = reader.option("minOffsetsPerTrigger", min_offsets_per_trigger)
    for k, v in options.items():
        reader = reader.option(k, v)
    raw = reader.load()
    return parse_kafka_value(raw, value_schema)


def parse_kafka_value(raw: DataFrame, value_schema: StructType | str | None) -> DataFrame:
    """Kafka value-decode stage (split out so the parse logic is
    testable against a synthetic frame with the Kafka wire schema —
    ``value: binary, timestamp: timestamp`` — without a broker)."""
    if value_schema is None:
        return raw
    parsed = F.from_json(F.col("value").cast("string"), value_schema)
    return raw.select(F.col("timestamp"), parsed.alias("v")).select("timestamp", "v.*")


def socket_source(spark: SparkSession, host: str, port: int) -> DataFrame:
    """Line-based TCP source (reference: ``remoteSource.cpp`` TCP
    ingestion, ``README.md:154-157``). One string column ``value``;
    parse with ``from_csv``/``from_json`` downstream. Test-only in
    Spark's docs — production streams should land on Kafka or files."""
    return (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", port)
        .load()
    )
