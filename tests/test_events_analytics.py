"""Semantic edge cases for the events-analytics and boilerplate
operators, on constructed fixtures (written as parquet so the queries
run their real load path — including NTZ timestamp handling)."""

from __future__ import annotations

import datetime as dt

import pytest

from apache_beam_java_firestore_batch_dataflow_spark.operators import dedup, timeseries

from .conftest import sorted_rows


def _write_events(spark, path, rows):
    """rows: (event_id, ts, user_id, event_type)."""
    df = spark.createDataFrame(
        [(e, t, u, ty, 1.0, "{}") for e, t, u, ty in rows],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.write.mode("overwrite").parquet(f"{path}/events.parquet")


T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _ts(minutes):
    return T0 + dt.timedelta(minutes=minutes)


def test_funnel_requires_strict_step_order(spark, tmp_path):
    sf = str(tmp_path)
    _write_events(
        spark,
        sf,
        [
            # user 1: the happy path signup -> click -> purchase
            (1, _ts(0), 1, "signup"),
            (2, _ts(1), 1, "click"),
            (3, _ts(2), 1, "purchase"),
            # user 2: purchase BEFORE the first post-signup click — must
            # reach stage 2 but NOT stage 3 (ordered semantics)
            (4, _ts(0), 2, "signup"),
            (5, _ts(1), 2, "purchase"),
            (6, _ts(2), 2, "click"),
            # user 3: clicks but never signed up — no stage at all
            (7, _ts(0), 3, "click"),
            (8, _ts(1), 3, "purchase"),
        ],
    )
    got = dict(
        (r["stage"], r["n_users"])
        for r in timeseries.QUERIES["q_events_funnel"](spark, sf).collect()
    )
    assert got == {"1_signup": 2, "2_click": 2, "3_purchase": 1}


def test_retention_counts_only_within_k_days(spark, tmp_path):
    sf = str(tmp_path)
    day = lambda d: dt.datetime(2024, 1, 1 + d, 9, 0, 0)
    _write_events(
        spark,
        sf,
        [
            (1, day(0), 1, "click"),
            (2, day(0), 1, "view"),   # same day, still one (user, day)
            (3, day(1), 1, "click"),
            (4, day(9), 1, "click"),  # beyond RETENTION_MAX_K — dropped
            (5, day(2), 2, "click"),  # user 2 cohort = day 2
        ],
    )
    rows = sorted_rows(timeseries.QUERIES["q_events_retention"](spark, sf))
    assert rows == [
        (dt.date(2024, 1, 1), 0, 1),
        (dt.date(2024, 1, 1), 1, 1),
        (dt.date(2024, 1, 3), 0, 1),
    ]


def test_transitions_counts_and_row_normalized_probs(spark, tmp_path):
    sf = str(tmp_path)
    _write_events(
        spark,
        sf,
        [
            (1, _ts(0), 1, "a"),
            (2, _ts(1), 1, "b"),
            (3, _ts(2), 1, "a"),
            (4, _ts(3), 1, "c"),
            # second user: a -> b again, so P(b|a) = 2/3, P(c|a) = 1/3
            (5, _ts(0), 2, "a"),
            (6, _ts(1), 2, "b"),
        ],
    )
    got = {
        (r["src"], r["dst"]): (r["n"], r["p"])
        for r in timeseries.QUERIES["q_events_transitions"](spark, sf).collect()
    }
    assert got[("a", "b")] == (2, pytest.approx(0.666667))
    assert got[("a", "c")] == (1, pytest.approx(0.333333))
    assert got[("b", "a")] == (1, pytest.approx(1.0))


def test_boilerplate_removes_ubiquitous_chunks_and_keeps_order(spark, tmp_path):
    sf = str(tmp_path)
    n = dedup.BP_MIN_DOCS
    docs = [(i, f"x y unique{i}", "en", "s", 12) for i in range(n)]
    # one doc whose chunks are NOT ubiquitous; trailing partial chunk
    # ("e") must be dropped, retained chunks re-join in order
    docs.append((100, "a b c d e", "en", "s", 9))
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{sf}/documents.parquet")
    rows = {
        r["doc_id"]: (r["n_chunks"], r["n_boilerplate"], r["clean_text"])
        for r in dedup.QUERIES["q_dedup_boilerplate_chunks"](spark, sf).collect()
    }
    # every "x y" doc: one full chunk, boilerplate (appears in BP_MIN_DOCS
    # docs), so the cleaned text is empty
    assert rows[0] == (1, 1, "")
    assert rows[100] == (2, 0, "a b c d")


def test_boilerplate_drops_degenerate_docs_like_oracle(spark, tmp_path):
    """Docs with fewer tokens than one chunk (empty / punctuation-only /
    single-token) must be silently dropped — the oracle's range() returns
    an empty list for them; an unguarded F.sequence raises 'Illegal
    sequence boundaries' instead (ADVICE r4)."""
    sf = str(tmp_path)
    n = dedup.BP_MIN_DOCS
    docs = [(i, f"x y unique{i}", "en", "s", 12) for i in range(n)]
    docs += [(200, "", "en", "s", 0),        # zero tokens
             (201, "!!! ...", "en", "s", 7),  # punctuation-only -> zero tokens
             (202, "solo", "en", "s", 4)]     # one token < BP_CHUNK_W
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{sf}/documents.parquet")
    rows = {
        r["doc_id"]: (r["n_chunks"], r["n_boilerplate"])
        for r in dedup.QUERIES["q_dedup_boilerplate_chunks"](spark, sf).collect()
    }
    assert 200 not in rows and 201 not in rows and 202 not in rows
    assert rows[0] == (1, 1)
