"""Text-line source (reference O1: ``TextIO.read().from(path)``,
``NaiveImplementation.java:36``).

``spark.read.text`` yields one row per line with column ``value`` and
supports globs natively; ``gs://`` paths work when the GCS Hadoop
connector jar is on the classpath (same deployment-time concern as Beam's
``gcsio``).  Scans are split by ``spark.sql.files.maxPartitionBytes`` —
a 100 TB text corpus parallelizes across executors with no extra code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_lines(spark: SparkSession, path: str) -> DataFrame:
    """One row per line: DataFrame[value: string]."""
    return spark.read.text(path)
