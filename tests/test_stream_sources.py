"""Unbounded-source wiring: the rate source is a REAL unbounded stream
available in-sandbox; JDBC validates its parallel-read contract."""

from __future__ import annotations

import time

import pytest

from apache_beam_java_firestore_batch_dataflow_spark.sources.streams import (
    rate_stream,
    read_jdbc,
)


def test_rate_source_streams_windowed_counts(spark, tmp_path):
    from pyspark.sql import functions as F

    stream = rate_stream(spark, rows_per_second=50, num_partitions=2)
    assert stream.isStreaming
    agg = (
        stream.withWatermark("timestamp", "0 seconds")
        .groupBy(F.window("timestamp", "1 second"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        agg.writeStream.outputMode("update")
        .format("memory")
        .queryName("rate_counts")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        deadline = time.monotonic() + 30
        rows = []
        while time.monotonic() < deadline:
            q.processAllAvailable()
            rows = spark.sql("SELECT * FROM rate_counts").collect()
            if rows and sum(r.n for r in rows) >= 50:
                break
            time.sleep(0.5)
        assert rows, "rate source produced no windows"
        assert all(r.n > 0 for r in rows)
    finally:
        q.stop()


def test_jdbc_rejects_partial_partition_config(spark):
    with pytest.raises(ValueError, match="ALL of partition_column"):
        read_jdbc(
            spark,
            url="jdbc:postgresql://db/x",
            table="t",
            partition_column="id",
            num_partitions=8,
        )
