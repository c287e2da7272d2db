"""Unbounded sources beyond file replay (SURVEY §2.2 "sources: DB/queue/
stream").

* ``rate_stream`` — Spark's built-in rate source: a real unbounded source
  usable in this sandbox, for wiring/watermark tests and load drills.
* ``read_jdbc`` — partitioned-parallel JDBC scan wrapper.  No database or
  driver jar ships in this environment, so construction validates options
  only; the parallel-read contract (partitionColumn + bounds + numPartitions
  → one executor query per stride) is the piece that matters at scale:
  an unpartitioned JDBC read funnels the whole table through ONE task.
* Kafka requires the ``spark-sql-kafka`` package at deploy time:
  ``spark.readStream.format("kafka")`` with ``subscribe``/bootstrap options
  — same DataFrame surface as the rate source; documented here, untestable
  in this sandbox.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


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
