"""Curation operators: the determinism / bound properties the module
claims, beyond the DuckDB value parity the driver already checks."""

from __future__ import annotations

from pyspark.sql import functions as F

from apache_beam_java_firestore_batch_dataflow_spark.operators import curation
from apache_beam_java_firestore_batch_dataflow_spark.sources.tables import load_table


def test_hash_sample_invariant_under_partitioning(spark, sf_dir):
    """The sampled set must not depend on how the input is partitioned —
    the property rand()-based sample() does NOT have."""
    base = sorted(
        r["doc_id"]
        for r in curation.QUERIES["q_sample_hash_deterministic"](
            spark, sf_dir
        ).collect()
    )
    docs = load_table(spark, sf_dir, "documents").repartition(13)
    resampled = sorted(
        r["doc_id"]
        for r in docs.filter(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2) < "40"
        ).select("doc_id").collect()
    )
    assert base == resampled
    # ~25% rate with binomial slack
    n_total = load_table(spark, sf_dir, "documents").count()
    assert 0.15 * n_total < len(base) < 0.35 * n_total


def test_stratified_quota_exact(spark, sf_dir):
    out = curation.QUERIES["q_sample_stratified_quota"](spark, sf_dir)
    per_lang = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    docs = load_table(spark, sf_dir, "documents")
    stratum = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    for lang, n in per_lang.items():
        assert n == min(stratum[lang], 100)


def test_pack_bins_respect_budget_modulo_one_doc(spark, sf_dir):
    """Sequential packing: every bin except a group's last holds ≥1 doc
    and overflows the budget by at most one document's size."""
    docs = load_table(spark, sf_dir, "documents")
    max_doc = docs.agg(F.max("n_chars")).collect()[0][0]
    out = curation.QUERIES["q_pack_char_budget"](spark, sf_dir).collect()
    budget = 20_000
    for r in out:
        assert r["n_docs"] >= 1
        assert r["total_chars"] < budget + max_doc


def test_sessionize_counts_consistent(spark, sf_dir):
    """Sessions partition the events exactly: per-user session event
    counts sum to the user's event count, and sessions don't overlap."""
    out = curation.QUERIES["q_sessionize_gaps"](spark, sf_dir)
    events = load_table(spark, sf_dir, "events")
    total = events.count()
    assert out.agg(F.sum("n_events")).collect()[0][0] == total
    bad_bounds = out.filter(F.col("session_end") < F.col("session_start")).count()
    assert bad_bounds == 0


def test_sessionize_deterministic_under_tied_timestamps(spark):
    """Two events with identical (user_id, ts) where the earlier-by-id row
    opens a session: the running-sum window orders by (ts, event_id), so
    session assignment of the tied rows is total-ordered and stable
    (ADVICE scenario — fixtures have no such ties, so pin it here)."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)
    rows = [
        # session 1: one event, then a >30min gap
        (1, 100, t0, "click", 1.0),
        # tied pair: event 101 opens session 2; 102 shares its timestamp
        (1, 101, t0 + dt.timedelta(minutes=45), "click", 2.0),
        (1, 102, t0 + dt.timedelta(minutes=45), "click", 3.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, event_type string, value double"
    )

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    # the same window logic q_sessionize_gaps uses (pinned ordering)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    gap_us = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    flagged = df.withColumn(
        "is_new", F.when(gap_us.isNull() | (gap_us > 1_800_000_000), 1).otherwise(0)
    )
    sessions = flagged.withColumn("session_no", F.sum("is_new").over(run))
    got = {
        (r.event_id): r.session_no for r in sessions.select("event_id", "session_no").collect()
    }
    # both tied rows land in session 2 deterministically
    assert got == {100: 1, 101: 2, 102: 2}
