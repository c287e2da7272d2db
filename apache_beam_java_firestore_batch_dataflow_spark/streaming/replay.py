"""Replay a bounded events table as a file-source stream.

The driver testdata is static parquet; Structured Streaming's file source
turns it into a real incremental stream: the table is split into
chronological chunk files, and ``readStream`` with ``maxFilesPerTrigger=1``
delivers one chunk per micro-batch — event-time order roughly matches
arrival order, which is what makes watermark/late-data tests meaningful.

This mirrors production backfill/replay: the same windowed transforms
(streaming/windows.py) run unchanged over Kafka, rate, or file sources;
only this source wiring differs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table


def write_event_chunks(
    spark: SparkSession, sf_dir: str, chunk_dir: str, n_chunks: int = 4
) -> None:
    """Split ``events`` into n_chunks chronological parquet files."""
    events = load_table(spark, sf_dir, "events")
    bounds = [
        r["b"]
        for r in events.select(
            F.percentile_approx(
                "ts", [i / n_chunks for i in range(1, n_chunks)], 10_000
            ).alias("b")
        ).collect()
    ][0]
    lo = None
    for i in range(n_chunks):
        hi = bounds[i] if i < n_chunks - 1 else None
        chunk = events
        if lo is not None:
            chunk = chunk.filter(F.col("ts") > F.lit(lo))
        if hi is not None:
            chunk = chunk.filter(F.col("ts") <= F.lit(hi))
        chunk.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(chunk_dir, f"chunk-{i:03d}")
        )
        lo = hi


def read_event_stream(
    spark: SparkSession, chunk_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source stream over the chunk files, one chunk per micro-batch."""
    schema = (
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("recursiveFileLookup", "true")
        .parquet(chunk_dir)
    )
