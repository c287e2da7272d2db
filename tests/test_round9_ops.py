"""Semantic tests for the round-9 operator batch (and the two round-8
snapshot operators that shipped without tests — VERDICT r8 item 1).
Each operator is checked against an independent computation, never a
snapshot (SURVEY.md §5 test strategy)."""

from __future__ import annotations

import math

import numpy as np
import pyarrow.parquet as pq


def test_audio_zcr_matches_formula_replay(spark, sf_dir):
    """q_multimodal_audio_zcr decodes REAL WAV bytes; this test replays
    the sample-generating formula in pure Python (a third, independent
    path next to the Spark decoder and the DuckDB oracle) and demands
    bit-exact agreement on every clip."""
    from apache_beam_java_firestore_batch_dataflow_spark.operators.multimodal import (
        q_multimodal_audio_zcr,
    )

    doc_ids = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    )["doc_id"].to_pylist()

    expected = {}
    for d in doc_ids:
        n_frames = d % 50 + 20
        channels = d % 2 + 1
        s = np.array(
            [
                (d * 7919 + k * 104729) % 65521 - 32760
                for k in range(n_frames * channels)
            ],
            dtype=np.int64,
        )
        n = 0
        for ch in range(channels):
            sg = np.sign(s[ch::channels])
            n += int((sg[1:] * sg[:-1] == -1).sum())
        expected[d] = (channels, n)

    got = {
        r.doc_id: (r.channels, r.n_crossings)
        for r in q_multimodal_audio_zcr(spark, sf_dir).collect()
    }
    assert got == expected
    spark.catalog.clearCache()


def test_audio_zcr_zero_breaks_runs():
    """The crossing definition (sign(a)*sign(b) == -1) must treat an
    exact zero as breaking the run on BOTH sides: +,0,- is zero
    crossings, +,- is one.  Checked on the kernel's own numpy idiom so
    a refactor that switches to `diff(sign) != 0` fails loudly."""
    s = np.array([5, 0, -5], dtype=np.int64)
    sg = np.sign(s)
    assert int((sg[1:] * sg[:-1] == -1).sum()) == 0
    s2 = np.array([5, -5, 3, 2, -1], dtype=np.int64)
    sg2 = np.sign(s2)
    assert int((sg2[1:] * sg2[:-1] == -1).sum()) == 3


def test_regress_two_features_matches_numpy_lstsq(spark, sf_dir):
    """q_regress_two_features solves the 3x3 normal equations with
    Cramer's rule over exact integer sufficient statistics; numpy's
    QR-based lstsq over the same cent-quantized inputs must agree on
    coefficients and R^2 (independent solver, same model)."""
    from apache_beam_java_firestore_batch_dataflow_spark.operators.relational import (
        q_regress_two_features,
    )

    t = pq.read_table(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_quantity", "l_discount", "l_extendedprice"],
    )
    x1 = np.floor(np.asarray(t["l_quantity"], dtype=np.float64) * 100 + 0.5)
    x2 = np.floor(np.asarray(t["l_discount"], dtype=np.float64) * 100 + 0.5)
    y = np.floor(
        np.asarray(t["l_extendedprice"], dtype=np.float64) * 100 + 0.5
    )
    A = np.column_stack([np.ones_like(x1), x1, x2])
    beta, _, _, _ = np.linalg.lstsq(A, y, rcond=None)
    resid = y - A @ beta
    r2 = 1 - float(resid @ resid) / float(((y - y.mean()) ** 2).sum())

    row = q_regress_two_features(spark, sf_dir).collect()[0]
    assert row.n_rows == len(y)
    # Cramer-on-doubles vs QR agree to far better than 1e-6 relative on
    # this well-conditioned design; the round(6) outputs must match the
    # independent fit within one rounding step.
    assert math.isclose(row.b0_cents, beta[0], rel_tol=1e-6, abs_tol=2e-6)
    assert math.isclose(row.b1, beta[1], rel_tol=1e-6, abs_tol=2e-6)
    assert math.isclose(row.b2, beta[2], rel_tol=1e-6, abs_tol=2e-6)
    assert math.isclose(row.r2, r2, rel_tol=1e-6, abs_tol=2e-6)
    spark.catalog.clearCache()


def test_regress_two_features_single_agg_plan(spark, sf_dir):
    """Scale shape: the whole fit must be ONE aggregation over the scan
    (partial map-side combine -> single-row final) — no joins, no
    windows, no second pass over lineitem."""
    from apache_beam_java_firestore_batch_dataflow_spark.operators.relational import (
        q_regress_two_features,
    )

    plan = q_regress_two_features(
        spark, sf_dir
    )._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" in plan
    assert "Join" not in plan
    assert "Window" not in plan
    # one scan of lineitem only
    assert plan.count("Scan parquet") == 1


def test_weighted_stratified_sample_matches_python_replay(spark, sf_dir):
    """q_sample_weighted_stratified must select exactly the per-lang
    top-k by the Efraimidis-Spirakis key ln(u)/w — replayed here in
    pure Python from the same md5 uniforms (independent of both the
    Spark plan and the DuckDB oracle)."""
    import hashlib

    from apache_beam_java_firestore_batch_dataflow_spark.operators.curation import (
        WEIGHTED_STRATUM_K,
        q_sample_weighted_stratified,
    )

    t = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "n_chars"]
    )
    rows = list(
        zip(t["doc_id"].to_pylist(), t["lang"].to_pylist(), t["n_chars"].to_pylist())
    )
    by_lang = {}
    for d, lang, n in rows:
        if n <= 0:
            continue
        h = int(hashlib.md5(f"wss:{d}".encode()).hexdigest()[:14], 16)
        u = (h + 1) / float((1 << 56) + 1)
        key = math.log(u) / n
        by_lang.setdefault(lang, []).append((key, d, n))
    expected = set()
    for lang, items in by_lang.items():
        items.sort(key=lambda kn: (-kn[0], kn[1]))
        for key, d, n in items[:WEIGHTED_STRATUM_K]:
            expected.add((d, lang, n))

    got = {
        (r.doc_id, r.lang, r.n_chars)
        for r in q_sample_weighted_stratified(spark, sf_dir).collect()
    }
    assert got == expected
    spark.catalog.clearCache()


def test_weighted_stratified_plans_window_group_limit(spark, sf_dir):
    """Scale shape: the per-stratum top-k must plan as WindowGroupLimit
    (per-partition k-row heaps below the exchange), not a full sort."""
    from apache_beam_java_firestore_batch_dataflow_spark.operators.curation import (
        q_sample_weighted_stratified,
    )

    plan = q_sample_weighted_stratified(
        spark, sf_dir
    )._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


def _edit_distance(a: str, b: str) -> int:
    """Textbook O(len a * len b) Levenshtein, the independent checker."""
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_rerank_edit_distances_and_ranks_are_correct(spark, sf_dir):
    """Every emitted (doc, cand) pair's edit_dist must equal a pure-
    Python DP over the same normalized prefixes, ranks must be dense
    1..k ordered by (edit_dist, cand_id), and no doc may exceed the
    top-k quota."""
    import re as _re
    from collections import defaultdict

    from apache_beam_java_firestore_batch_dataflow_spark.operators.text import (
        RERANK_PREFIX,
        RERANK_TOP_K,
        q_text_rerank_edit,
    )

    texts = dict(
        zip(
            pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])[
                "doc_id"
            ].to_pylist(),
            pq.read_table(f"{sf_dir}/documents.parquet", columns=["text"])[
                "text"
            ].to_pylist(),
        )
    )

    def norm(s: str) -> str:
        s = _re.sub(r"[^a-z ]+", "", s.strip().lower())
        s = _re.sub(r" +", " ", s)
        return s[:RERANK_PREFIX]

    got = q_text_rerank_edit(spark, sf_dir).collect()
    assert got, "rerank emitted no rows at this SF"
    per_doc = defaultdict(list)
    for r in got:
        assert r.edit_dist == _edit_distance(
            norm(texts[r.doc_id]), norm(texts[r.cand_id])
        )
        per_doc[r.doc_id].append((r.rank, r.edit_dist, r.cand_id))
    for doc_id, items in per_doc.items():
        items.sort()
        assert [it[0] for it in items] == list(range(1, len(items) + 1))
        assert len(items) <= RERANK_TOP_K
        # rank order == (edit_dist, cand_id) order
        assert items == sorted(items, key=lambda it: (it[1], it[2]))
    spark.catalog.clearCache()


def test_audio_flatness_matches_formula_replay(spark, sf_dir):
    """q_multimodal_audio_flatness over real WAV bytes must agree
    bit-for-bit with a pure-Python replay of the generating formula
    (third independent path, like the ZCR test); silence-only check:
    a constant-energy envelope has flatness ~0."""
    from apache_beam_java_firestore_batch_dataflow_spark.operators.multimodal import (
        FLATNESS_BLOCK,
        q_multimodal_audio_flatness,
    )

    doc_ids = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    )["doc_id"].to_pylist()
    expected = {}
    for d in doc_ids:
        n_frames = d % 50 + 20
        channels = d % 2 + 1
        s = np.array(
            [
                (d * 7919 + k * 104729) % 65521 - 32760
                for k in range(n_frames * channels)
            ],
            dtype=np.int64,
        )
        n_blocks = sum_e1 = sum_ln6 = 0
        for ch in range(channels):
            x = s[ch::channels]
            e1 = (
                np.add.reduceat(x * x, range(0, len(x), FLATNESS_BLOCK)) + 1
            )
            n_blocks += len(e1)
            sum_e1 += int(e1.sum())
            sum_ln6 += int(
                np.floor(np.log(e1.astype(np.float64)) * 1e6 + 0.5).sum()
            )
        flat_mu = int(
            math.floor(
                sum_ln6 / n_blocks
                - math.floor(math.log(sum_e1 / n_blocks) * 1e6 + 0.5)
                + 0.5
            )
        )
        expected[d] = (channels, n_blocks, sum_e1, flat_mu)
        assert flat_mu <= 0  # AM-GM: log-flatness is never positive

    got = {
        r.doc_id: (r.channels, r.n_blocks, r.sum_e1, r.flat_mu)
        for r in q_multimodal_audio_flatness(spark, sf_dir).collect()
    }
    assert got == expected
    spark.catalog.clearCache()
