"""Unbounded sources beyond file replay (SURVEY §2.2 "sources: DB/queue/
stream").

* ``rate_stream`` — Spark's built-in rate source: a real unbounded source
  usable in this sandbox, for wiring/watermark tests and load drills.
* ``read_jdbc`` — partitioned-parallel JDBC scan wrapper.  The parallel-
  read contract (partitionColumn + bounds + numPartitions → one executor
  query per stride) is the piece that matters at scale: an unpartitioned
  JDBC read funnels the whole table through ONE task.  Driven end-to-end
  in tests against the embedded Derby engine that ships in Spark's jars
  (write → 4-way partitioned read → pushdown), so the contract is proven,
  not just validated.
* ``read_kafka`` — the Kafka reader surface.  The broker protocol needs
  the ``spark-sql-kafka`` package at deploy time (absent in-sandbox), so
  the wrapper validates the option contract (bootstrap servers + exactly
  one subscription mode) and ``kafka_like_stream`` provides a file-backed
  stand-in emitting the EXACT Kafka source schema — pipelines written
  against ``read_kafka``'s output run unchanged in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: The schema Spark's Kafka source produces (kafka-sql docs); every consumer
#: in this engine is written against these seven columns.
KAFKA_SOURCE_SCHEMA = (
    "key binary, value binary, topic string, partition int, "
    "offset bigint, timestamp timestamp, timestampType int"
)


def rate_stream(
    spark: SparkSession, rows_per_second: int = 100, num_partitions: int | None = None
) -> DataFrame:
    """Unbounded (timestamp, value) stream at a fixed rate — the standard
    source for streaming wiring tests and backpressure drills."""
    reader = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rows_per_second))
    )
    if num_partitions is not None:
        reader = reader.option("numPartitions", str(num_partitions))
    return reader.load()


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
    **options: str,
) -> DataFrame:
    """Partitioned JDBC scan.  For any table that isn't tiny, the four
    partitioning options are REQUIRED together — without them Spark issues
    a single query through a single task, which at warehouse scale is a
    silent 1000×-parallelism loss, so this wrapper refuses half-configured
    reads instead."""
    part_opts = (partition_column, lower_bound, upper_bound, num_partitions)
    configured = [o for o in part_opts if o is not None]
    if configured and len(configured) != 4:
        raise ValueError(
            "partitioned JDBC read needs ALL of partition_column/lower_bound/"
            "upper_bound/num_partitions (got a partial set); omit all four "
            "only for tiny tables"
        )
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if configured:
        reader = (
            reader.option("partitionColumn", str(partition_column))
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def read_kafka(
    spark: SparkSession,
    bootstrap_servers: str,
    *,
    subscribe: str | None = None,
    subscribe_pattern: str | None = None,
    assign: str | None = None,
    starting_offsets: str = "earliest",
    **options: str,
) -> DataFrame:
    """Kafka stream with the option contract enforced up front.

    Kafka demands exactly ONE subscription mode; Spark defers that error
    to stream start, where it surfaces as an opaque analysis failure —
    this wrapper raises at construction instead.  Requires the
    ``spark-sql-kafka`` package on the classpath at deploy time."""
    if not bootstrap_servers:
        raise ValueError("kafka.bootstrap.servers is required")
    modes = {
        "subscribe": subscribe,
        "subscribePattern": subscribe_pattern,
        "assign": assign,
    }
    chosen = {k: v for k, v in modes.items() if v is not None}
    if len(chosen) != 1:
        raise ValueError(
            "exactly one of subscribe / subscribe_pattern / assign must be "
            f"set (got {sorted(chosen) or 'none'})"
        )
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("startingOffsets", starting_offsets)
    )
    for k, v in chosen.items():
        reader = reader.option(k, v)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


#: Input contract for the Kafka stand-in: one json record per message.
KAFKA_LIKE_INPUT_SCHEMA = (
    "key string, value string, partition int, offset bigint, "
    "timestamp timestamp"
)


def kafka_like_stream(
    spark: SparkSession,
    input_dir: str,
    topic: str = "events",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-backed Kafka stand-in: an unbounded file stream projected to
    ``KAFKA_SOURCE_SCHEMA``.

    Messages arrive as json files under ``input_dir`` (schema
    ``KAFKA_LIKE_INPUT_SCHEMA``); the projection encodes key/value to
    binary and stamps topic/timestampType exactly as the real source
    does, so downstream code — ``CAST(value AS STRING)``, watermarks on
    ``timestamp``, per-partition offset dedup — is byte-compatible with
    a production ``read_kafka`` swap."""
    reader = spark.readStream.schema(KAFKA_LIKE_INPUT_SCHEMA)
    if max_files_per_trigger is not None:
        # one-file-per-trigger mirrors Kafka's maxOffsetsPerTrigger for
        # multi-micro-batch tests
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    raw = reader.json(input_dir)
    return raw.select(
        F.encode("key", "UTF-8").alias("key"),
        F.encode("value", "UTF-8").alias("value"),
        F.lit(topic).alias("topic"),
        F.col("partition").cast("int").alias("partition"),
        F.col("offset").cast("bigint").alias("offset"),
        F.col("timestamp"),
        F.lit(0).cast("int").alias("timestampType"),  # CreateTime
    )
