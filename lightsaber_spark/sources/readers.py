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
        if dict(df.dtypes).get(c) == "bigint":
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"{c} div 1000")))
    return df


def rate_source(
    spark: SparkSession,
    rows_per_second: int = 1000,
    num_partitions: int | None = None,
) -> DataFrame:
    """Synthetic benchmark stream: monotonically increasing ``value``
    with a ``timestamp`` column — the Spark analog of the reference's
    replay/generator drivers (``RandomDataGenerator.h:102-110``)."""
    reader = spark.readStream.format("rate").option(
        "rowsPerSecond", rows_per_second
    )
    if num_partitions is not None:
        reader = reader.option("numPartitions", num_partitions)
    return reader.load()


def kafka_source(
    spark: SparkSession,
    bootstrap_servers: str,
    topics: str,
    value_schema: StructType | str | None = None,
    starting_offsets: str = "latest",
    fail_on_data_loss: bool = True,
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
