"""Round-13 addition: exact-substring dedup (>= SPAN_K-token verbatim
spans, the exact half of the Lee et al. 2022 dedup recipe — VERDICT r12
item 2).
"""

from __future__ import annotations

import itertools
import re

from pyspark.sql import types as T

from .conftest import SF_DIR, sorted_rows

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def _word(i: int) -> str:
    """Distinct letters-only token per index (the tokenizer splits on
    non-letters, so digits would vanish): 'w' + base-26 in a..z."""
    digits = []
    for _ in range(3):
        i, d = divmod(i, 26)
        digits.append(chr(ord("a") + d))
    return "w" + "".join(reversed(digits))


def _doc_fixture(spark, tmp_path, docs: dict[int, list[str]]) -> str:
    rows = [
        (did, " ".join(toks), "en", "unit", len(" ".join(toks)))
        for did, toks in docs.items()
    ]
    spark.createDataFrame(rows, DOC_SCHEMA).coalesce(1).write.parquet(
        str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


def test_exact_substring_golden_spans(spark, tmp_path):
    """Constructed corpus with known verbatim overlaps:

    * doc 1: tokens 0..119 (120 tokens)
    * doc 2: a 60-token span of doc 1 (tokens 20..79) at offset 10 →
      one shared span of exactly 60
    * doc 3: only a 49-token span of doc 1 → below SPAN_K, no pair
    * doc 4: verbatim copy of doc 1 → span 120 with doc 1; the same
      60-token overlap with doc 2
    * doc 5: TWO disjoint 50-token spans of doc 1 at different
      alignment offsets, separated by unique filler → n_spans == 2
    """
    from apache_beam_java_firestore_batch_dataflow_spark.operators.dedup import (
        SPAN_K,
        q_dedup_exact_substring,
    )

    assert SPAN_K == 50
    w = _word
    base = [w(i) for i in range(120)]
    filler = [w(1000 + i) for i in range(30)]
    filler2 = [w(2000 + i) for i in range(15)]
    docs = {
        1: base,
        2: [w(3000 + i) for i in range(10)] + base[20:80] + [w(4000 + i) for i in range(10)],
        3: [w(5000 + i) for i in range(10)] + base[0:49] + [w(6000 + i) for i in range(10)],
        4: list(base),
        5: filler2 + base[0:50] + filler + base[60:110],
    }
    sf = _doc_fixture(spark, tmp_path, docs)
    got = sorted_rows(q_dedup_exact_substring(spark, sf))
    expect = sorted(
        [
            (1, 2, 1, 60),
            (1, 4, 1, 120),
            (2, 4, 1, 60),
            (1, 5, 2, 50),
            (4, 5, 2, 50),
        ]
    )
    assert got == expect


def _brute_exact_substring(toks: dict[int, list[str]], span_k: int) -> dict:
    """Driver-side reference: per doc pair, the maximal >=span_k-token
    verbatim spans via gram matching + per-diagonal run counting."""
    expect = {}
    for a, b in itertools.combinations(sorted(toks), 2):
        ta, tb = toks[a], toks[b]
        if len(ta) < span_k or len(tb) < span_k:
            continue
        grams_b: dict[tuple, list[int]] = {}
        for j in range(len(tb) - span_k + 1):
            grams_b.setdefault(tuple(tb[j : j + span_k]), []).append(j)
        hits = []  # (pos_a, pos_b) of matching span_k-grams, 1-based
        for i in range(len(ta) - span_k + 1):
            for j in grams_b.get(tuple(ta[i : i + span_k]), ()):
                hits.append((i + 1, j + 1))
        if not hits:
            continue
        bydiag: dict[int, list[int]] = {}
        for pa, pb in hits:
            bydiag.setdefault(pa - pb, []).append(pa)
        spans = []
        for ps in bydiag.values():
            ps.sort()
            run = 1
            for prev, cur in zip(ps, ps[1:]):
                if cur == prev + 1:
                    run += 1
                else:
                    spans.append(span_k + run - 1)
                    run = 1
            spans.append(span_k + run - 1)
        expect[(a, b)] = (len(spans), max(spans))
    return expect


def test_exact_substring_matches_brute_force_at_sf0001(spark):
    """The banded-join + gaps-and-islands pipeline must agree with a
    driver-side brute-force longest-common-span reference over every
    pair of real fixture docs (50 docs at sf0.001 → 1225 pairs)."""
    from apache_beam_java_firestore_batch_dataflow_spark.operators.dedup import (
        SPAN_K,
        q_dedup_exact_substring,
    )
    from apache_beam_java_firestore_batch_dataflow_spark.sources.tables import load_table

    rows = load_table(spark, SF_DIR, "documents").select("doc_id", "text").collect()
    toks = {
        r.doc_id: [t for t in re.split(r"[^a-zA-Z]+", r.text) if t]
        for r in rows
    }
    expect = _brute_exact_substring(toks, SPAN_K)
    got = {
        (r.doc_a, r.doc_b): (r.n_spans, r.max_span_tokens)
        for r in q_dedup_exact_substring(spark, SF_DIR).collect()
    }
    assert got == expect
    assert got, "fixture should contain at least one >=50-token overlap"


def test_exact_substring_randomized_planted_spans(spark, tmp_path):
    """Seeded randomized corpora against the brute-force reference —
    plants the shapes the golden test can't enumerate: copies of random
    slices between random docs (sometimes multiple per pair, sometimes
    OVERLAPPING, which must merge into one longer run), three-way
    copies, internal repetition (the same span twice in ONE doc, giving
    two alignment diagonals against its source), and boundary lengths
    49/50/51."""
    import random

    from apache_beam_java_firestore_batch_dataflow_spark.operators.dedup import (
        SPAN_K,
        q_dedup_exact_substring,
    )

    for seed in (7, 13):
        rng = random.Random(seed)
        n_docs = 24
        docs: dict[int, list[str]] = {}
        for did in range(1, n_docs + 1):
            length = rng.randint(30, 140)
            # per-doc-distinct vocab: accidental cross-doc 50-gram
            # matches are impossible; only planted spans match
            docs[did] = [_word(did * 10_000 + i) for i in range(length)]
        # plant copies (including boundary lengths that must NOT match)
        for _ in range(18):
            src = rng.randint(1, n_docs)
            dst = rng.randint(1, n_docs)
            span = rng.choice([SPAN_K - 1, SPAN_K, SPAN_K + 1, 60, 75])
            if len(docs[src]) < span:
                continue
            start = rng.randint(0, len(docs[src]) - span)
            chunk = docs[src][start : start + span]
            at = rng.randint(0, len(docs[dst]))
            docs[dst] = docs[dst][:at] + chunk + docs[dst][at:]
        sub = tmp_path / f"seed{seed}"
        sub.mkdir()
        sf = _doc_fixture(spark, sub, docs)
        expect = _brute_exact_substring(docs, SPAN_K)
        got = {
            (r.doc_a, r.doc_b): (r.n_spans, r.max_span_tokens)
            for r in q_dedup_exact_substring(spark, sf).collect()
        }
        assert got == expect, f"seed {seed}"
        assert expect, f"seed {seed} planted no >=SPAN_K span (regen seeds)"


def test_exact_substring_plan_is_fingerprint_equijoin(spark):
    """Scale pin: candidates come from an EQUI-join on the gram
    fingerprint — no cartesian product / nested-loop join anywhere, and
    the hot join keys are hash-partitioned (SortMergeJoin or
    ShuffledHashJoin), matching the O(matched postings) claim."""
    from apache_beam_java_firestore_batch_dataflow_spark.operators.dedup import (
        q_dedup_exact_substring,
    )

    plan = (
        q_dedup_exact_substring(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan) or (
        "BroadcastHashJoin" in plan
    )


# ---------------------------------------------------------------------------
# host-band anchor column (ADVICE r12)
# ---------------------------------------------------------------------------


def test_host_band_anchor_column_is_permanent():
    """The anchor column must cover the same probes as the refreshable
    references and be reported alongside them, so code-side drift can be
    diffed out of reference refreshes."""
    import bench

    assert set(bench.HOST_BAND_ANCHOR) == set(bench.HOST_BAND_REFERENCE)
    hb = bench.host_band_signal(
        {"naive_sec": bench.HOST_BAND_ANCHOR["naive_sec"]},
        {"semantic_edges_shared": bench.HOST_BAND_ANCHOR["semantic_edges_shared"]},
    )
    assert hb["sink_leg_anchor_ratio"] == 1.0
    assert hb["kernel_build_anchor_ratios"] == {"semantic_edges_shared": 1.0}
    # the anchor NEVER moves: r11 closing values + the contamination
    # kernel's first in-band r12 value + the python probe's first
    # in-band r16 calibration, pinned by contract
    assert bench.HOST_BAND_ANCHOR == {
        "naive_sec": 1.475,
        "semantic_edges_shared": 1.358,
        "minhash_pairs_shared": 3.236,
        "copurchase_adj_shared": 1.196,
        "contamination_hits_shared": 2.739,
        "python_probe_cold_sec": 3.18,
        "python_probe_warm_sec": 0.47,
    }


# ---------------------------------------------------------------------------
# sf0.1 sweep fixes: exact half-boundary rounding + wide-sum overflow
# ---------------------------------------------------------------------------


def test_round4_away_exact_half_boundaries(spark):
    """The micro-unit release rounding must be half-AWAY-from-zero at
    EXACT boundaries — the class where round(double, 4) diverged
    between engines (r13 sf0.1 sweep: 369 + 0.09295 read 369.093 on one
    engine and 369.0929 on the other)."""
    from apache_beam_java_firestore_batch_dataflow_spark.operators.privacy import (
        _round4_away,
    )

    rows = [(92950,), (-92950,), (92949,), (92951,), (50,), (-50,), (0,)]
    df = spark.createDataFrame(rows, "m6 long").select(
        "m6", _round4_away("m6").alias("r4")
    )
    got = {r.m6: r.r4 for r in df.collect()}
    assert got == {
        92950: 0.093,   # exact half -> away from zero
        -92950: -0.093,
        92949: 0.0929,
        92951: 0.093,
        50: 0.0001,     # 0.00005 -> away
        -50: -0.0001,
        0: 0.0,
    }


def test_regress_sums_survive_sf01_row_counts(spark):
    """Σy² at cent quantization is ~10¹⁴/row: an int64 accumulator
    overflows past ~10⁵ rows (the sf0.1 sweep failure — ANSI Spark
    raised ARITHMETIC_OVERFLOW where DuckDB silently widened to
    int128).  The DECIMAL(38,0) accumulation must survive sf0.1."""
    import os

    import pytest as _pytest

    from apache_beam_java_firestore_batch_dataflow_spark.operators.relational import (
        QUERIES,
    )

    sf01 = "/root/testdata/sf0.1"
    if not os.path.isdir(sf01):
        _pytest.skip("sf0.1 fixture not present")
    row = QUERIES["q_regress_two_features"](spark, sf01).collect()
    assert len(row) == 1 and row[0].n_rows > 500_000
    assert abs(row[0].r2) <= 1.0
