"""Unit tests: as-of join edge cases and the applyInPandasWithState
stateful streaming operator."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from apache_beam_java_firestore_batch_dataflow_spark.operators.timeseries import (
    asof_join,
)
from apache_beam_java_firestore_batch_dataflow_spark.sources.tables import load_table
from apache_beam_java_firestore_batch_dataflow_spark.streaming.replay import (
    read_event_stream,
    write_event_chunks,
)
from apache_beam_java_firestore_batch_dataflow_spark.streaming.stateful import (
    running_user_totals,
)

from .conftest import sorted_rows


def _ts_df(spark, name, rows):
    return spark.createDataFrame(rows, f"{name} long, ts_s string").select(
        name, F.col("ts_s").cast("timestamp").alias("ts")
    )


def test_asof_join_edges(spark):
    left = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00", 100),  # exact-tie right at 10:00 matches
            (1, "2024-01-01 09:00:00", 101),  # before any right -> null
            (2, "2024-01-01 12:00:00", 102),  # picks 11:00, not 10:30
            (3, "2024-01-01 12:00:00", 103),  # key with no right rows -> null
        ],
        "k long, ts_s string, payload long",
    ).select("k", F.col("ts_s").cast("timestamp").alias("ts"), "payload")
    right = _ts_df(
        spark,
        "k",
        [(1, "2024-01-01 10:00:00"), (2, "2024-01-01 10:30:00"), (2, "2024-01-01 11:00:00")],
    )
    got = {
        r["payload"]: (str(r["asof_ts"]) if r["asof_ts"] else None)
        for r in asof_join(left, right, on="k").collect()
    }
    assert got == {
        100: "2024-01-01 10:00:00",
        101: None,
        102: "2024-01-01 11:00:00",
        103: None,
    }


def test_running_user_totals_stream(spark, sf_dir, tmp_path):
    """Replayed chunks through the stateful operator: the last emitted row
    per user equals the batch groupBy totals, and intermediate emissions
    are cumulative (monotone n_events)."""
    chunk_dir = str(tmp_path / "chunks")
    spool = str(tmp_path / "spool")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(spool)
    write_event_chunks(spark, sf_dir, chunk_dir, n_chunks=2)

    stream = read_event_stream(spark, chunk_dir).filter(F.col("user_id") < 40)
    totals = running_user_totals(stream, timeout_ms=0)

    def emit(batch_df, batch_id):
        rows = batch_df.collect()
        with open(os.path.join(spool, f"b{batch_id:05d}.txt"), "w") as fh:
            for r in rows:
                fh.write(f"{r['user_id']},{r['n_events']},{r['sum_value']}\n")

    q = (
        totals.writeStream.outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreachBatch(emit)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    last: dict[int, tuple[int, float]] = {}
    prev_n: dict[int, int] = {}
    for name in sorted(os.listdir(spool)):
        with open(os.path.join(spool, name)) as fh:
            for line in fh:
                uid, n, sv = line.strip().split(",")
                uid, n = int(uid), int(n)
                assert n >= prev_n.get(uid, 0), "running count must be monotone"
                prev_n[uid] = n
                last[uid] = (n, float(sv))

    expected = {
        r["user_id"]: (r["n"], round(r["sv"], 6))
        for r in load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") < 40)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sv"))
        .collect()
    }
    got = {uid: (n, round(sv, 4)) for uid, (n, sv) in last.items()}
    want = {uid: (n, round(sv, 4)) for uid, (n, sv) in expected.items()}
    assert got == want


def test_stateful_timeout_emits_final(spark, tmp_path):
    """Idle keys time out: the operator emits final=True with the
    accumulated totals and frees the state."""
    src = str(tmp_path / "src")
    spool = str(tmp_path / "spool")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(spool)
    spark.createDataFrame(
        [(1, 2.0), (1, 3.0), (2, 5.0)], "user_id long, value double"
    ).coalesce(1).write.parquet(src)

    stream = (
        spark.readStream.schema("user_id long, value double").parquet(src)
    )
    totals = running_user_totals(stream, timeout_ms=1000)

    def emit(batch_df, batch_id):
        rows = batch_df.collect()
        if rows:
            with open(os.path.join(spool, f"b{batch_id:05d}.txt"), "w") as fh:
                for r in rows:
                    fh.write(
                        f"{r['user_id']},{r['n_events']},{r['sum_value']},{r['final']}\n"
                    )

    q = (
        totals.writeStream.outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreachBatch(emit)
        .trigger(processingTime="1 second")
        .start()
    )

    def read_finals() -> dict[int, tuple[int, float]]:
        finals: dict[int, tuple[int, float]] = {}
        for name in sorted(os.listdir(spool)):
            with open(os.path.join(spool, name)) as fh:
                for line in fh:
                    uid, n, sv, fin = line.strip().split(",")
                    if fin == "True":
                        finals[int(uid)] = (int(n), float(sv))
        return finals

    import time as _time

    deadline = _time.monotonic() + 90
    finals = read_finals()
    while len(finals) < 2 and _time.monotonic() < deadline:
        _time.sleep(1)
        finals = read_finals()
    q.stop()
    assert finals == {1: (2, 5.0), 2: (1, 5.0)}
