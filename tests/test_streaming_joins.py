"""Stream-stream interval join + streaming dedup: batch/stream parity on
the replayed events table, and bounded-state dedup across micro-batches."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from apache_beam_java_firestore_batch_dataflow_spark.sources.tables import load_table
from apache_beam_java_firestore_batch_dataflow_spark.streaming.joins import (
    click_error_interval_join,
    dedup_replayed,
)
from apache_beam_java_firestore_batch_dataflow_spark.streaming.replay import (
    read_event_stream,
    write_event_chunks,
)

from .conftest import sorted_rows


def test_stream_stream_join_parity(spark, sf_dir, tmp_path):
    """The interval join over two readStream sides (4 chronological
    chunks each) emits exactly the batch join's matches."""
    chunk_dir = str(tmp_path / "chunks")
    write_event_chunks(spark, sf_dir, chunk_dir, n_chunks=4)

    events = load_table(spark, sf_dir, "events")
    batch = sorted_rows(
        click_error_interval_join(
            events.filter(F.col("event_type") == "click"),
            events.filter(F.col("event_type") == "error"),
        )
    )

    stream = read_event_stream(spark, chunk_dir)
    clicks = stream.filter(F.col("event_type") == "click").withWatermark(
        "ts", "30 minutes"
    )
    errors = stream.filter(F.col("event_type") == "error").withWatermark(
        "ts", "30 minutes"
    )
    q = (
        click_error_interval_join(clicks, errors)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("ssj_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = sorted_rows(spark.table("ssj_out"))
    spark.catalog.dropTempView("ssj_out")
    assert got == batch
    assert len(q.recentProgress) >= 2  # genuinely incremental


def test_dedup_within_watermark_across_microbatches(spark, tmp_path):
    """An event re-delivered in a later micro-batch (within the
    watermark) is dropped by dropDuplicatesWithinWatermark — exactly-once
    output from an at-least-once source with bounded key state."""
    src = str(tmp_path / "src")
    os.makedirs(src)

    def write_file(name, rows):
        spark.createDataFrame(
            rows, "event_id long, ts_s string, user_id long"
        ).select(
            "event_id", F.col("ts_s").cast("timestamp").alias("ts"), "user_id"
        ).coalesce(1).write.mode("append").parquet(src)

    write_file("a", [(1, "2024-06-01 10:00:00", 7), (2, "2024-06-01 10:01:00", 8)])
    write_file("b", [(2, "2024-06-01 10:01:00", 8), (3, "2024-06-01 10:02:00", 7)])

    stream = (
        spark.readStream.schema("event_id long, ts timestamp, user_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    deduped = stream.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(r["event_id"] for r in spark.table("dedup_out").collect())
    spark.catalog.dropTempView("dedup_out")
    assert got == [1, 2, 3]  # the replayed event_id=2 appears once


def test_batch_dedup_replayed_collapses(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    out = dedup_replayed(events.unionAll(events))
    assert out.count() == events.count()


def test_outer_interval_join_emits_null_after_both_watermarks(spark, tmp_path):
    """LEFT OUTER stream-stream interval join semantics, live: the
    unmatched click's NULL row emits only once BOTH sides' watermarks
    (Spark takes the min) prove no match can still arrive — i.e. the
    global watermark passes click_ts + bound.  Pushers on each side
    advance the watermarks; a click whose horizon hasn't passed stays
    buffered (not emitted at all), and right-side rows never emit
    alone."""
    import time

    from pyspark.sql import functions as F

    csrc = str(tmp_path / "oc")
    esrc = str(tmp_path / "oe")
    ckpt = str(tmp_path / "ockpt")

    def wr(path, rows):
        spark.createDataFrame(
            rows, "ts_s string, user_id long, event_id long"
        ).select(
            F.col("ts_s").cast("timestamp").alias("ts"), "user_id", "event_id"
        ).coalesce(1).write.mode("append").parquet(path)

    out: list[tuple] = []

    def run_once():
        c = (
            spark.readStream.schema("ts timestamp, user_id long, event_id long")
            .option("maxFilesPerTrigger", 1)
            .parquet(csrc)
            .withWatermark("ts", "1 second")
            .select(
                F.col("user_id").alias("c_user"),
                F.col("ts").alias("click_ts"),
                F.col("event_id").alias("click_id"),
            )
        )
        e = (
            spark.readStream.schema("ts timestamp, user_id long, event_id long")
            .option("maxFilesPerTrigger", 1)
            .parquet(esrc)
            .withWatermark("ts", "1 second")
            .select(
                F.col("user_id").alias("e_user"),
                F.col("ts").alias("error_ts"),
                F.col("event_id").alias("error_id"),
            )
        )
        j = c.join(
            e,
            (F.col("c_user") == F.col("e_user"))
            & (F.col("error_ts") >= F.col("click_ts"))
            & (
                F.col("error_ts")
                < F.col("click_ts") + F.expr("INTERVAL 7200 SECONDS")
            ),
            "leftOuter",
        )

        def emit(bdf, _bid):
            out.extend((r.c_user, r.click_id, r.error_id) for r in bdf.collect())

        q = (
            j.writeStream.outputMode("append")
            .option("checkpointLocation", ckpt)
            .foreachBatch(emit)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(150)

    # u1's click matches; u2's click has no error ever; 14:00 pushers on
    # BOTH sides drive the min-watermark past u1/u2's 12:00 horizon
    wr(csrc, [("2024-01-01 10:00:00", 1, 100), ("2024-01-01 10:00:00", 2, 200)])
    wr(esrc, [("2024-01-01 10:30:00", 1, 900)])
    time.sleep(1.1)
    wr(esrc, [("2024-01-01 14:00:00", 99, 901)])
    wr(csrc, [("2024-01-01 14:00:00", 97, 300)])
    run_once()
    assert sorted(out) == [(1, 100, 900), (2, 200, None)]
    # the 14:00 pusher click's own horizon (16:00) hasn't passed -> it
    # stays buffered; unmatched right-side errors never emit alone
    assert all(row[0] in (1, 2) for row in out)
