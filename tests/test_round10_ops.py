"""Semantic tests for the round-10 operator batch.  Each operator is
checked against an independent computation, never a snapshot
(SURVEY.md §5 test strategy)."""

from __future__ import annotations

import unicodedata

import numpy as np
import pyarrow.parquet as pq


def _tokens(line: str) -> list[str]:
    """Independent tokenizer replica: split on runs of non-letter
    codepoints (Unicode category L*), mirroring the Java ``[^\\p{L}]+``
    regex (see test_tokenizer_property.oracle_tokens)."""
    out: list[str] = []
    cur: list[str] = []
    for ch in line:
        if unicodedata.category(ch).startswith("L"):
            cur.append(ch)
        elif cur:
            out.append("".join(cur))
            cur = []
    if cur:
        out.append("".join(cur))
    return out


# ---------------------------------------------------------------------------
# q_mix_contamination_matrix
# ---------------------------------------------------------------------------


def test_contamination_matrix_matches_python_replay(spark, sf_dir):
    """Full independent replay: tokenize every document in Python, build
    per-source distinct 5-gram sets, and compare every pair's shared
    count / Jaccard / containment bit-exactly."""
    from apache_beam_java_firestore_batch_dataflow_spark.operators.curation import (
        DECONTAM_K,
        q_mix_contamination_matrix,
    )

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["source", "text"])
    per_source: dict[str, set] = {}
    for src, text in zip(t["source"].to_pylist(), t["text"].to_pylist()):
        toks = _tokens(text)
        gs = per_source.setdefault(src, set())
        for i in range(len(toks) - (DECONTAM_K - 1)):
            gs.add(" ".join(toks[i : i + DECONTAM_K]))

    expected = {}
    sources = sorted(per_source)
    for i, sa in enumerate(sources):
        for sb in sources[i + 1 :]:
            shared = len(per_source[sa] & per_source[sb])
            if shared == 0:
                continue
            na, nb = len(per_source[sa]), len(per_source[sb])
            expected[(sa, sb)] = (
                shared,
                na,
                nb,
                round(shared / (na + nb - shared), 6),
                round(shared / min(na, nb), 6),
            )

    got = {
        (r.source_a, r.source_b): (
            r.n_shared,
            r.n_a,
            r.n_b,
            r.jaccard6,
            r.containment6,
        )
        for r in q_mix_contamination_matrix(spark, sf_dir).collect()
    }
    assert got == expected
    assert got, "fixture must exercise at least one overlapping source pair"
    spark.catalog.clearCache()


def test_contamination_matrix_no_pair_explosion(spark, sf_dir):
    """The source-pair join must be an equi-join on the gram key (plus a
    residual source ordering filter) — never a cartesian/nested-loop
    pairing, mirroring the decontaminate-overlap plan pin."""
    from apache_beam_java_firestore_batch_dataflow_spark.operators import curation
    from apache_beam_java_firestore_batch_dataflow_spark.plans.explain import plan_text

    txt = plan_text(curation.QUERIES["q_mix_contamination_matrix"](spark, sf_dir))
    assert "CartesianProduct" not in txt
    assert "BroadcastNestedLoopJoin" not in txt
    spark.catalog.clearCache()


# ---------------------------------------------------------------------------
# q_ann_ivf_incremental
# ---------------------------------------------------------------------------


def test_ivf_incremental_matches_python_replay(spark, sf_dir):
    """Replay the frozen-quantizer assignment in Python: corpus-only LCG
    hash-order centroid selection, then per-batch-vector sequential
    left-fold cosine (the engines' fold order — NOT np.dot) against all
    centroids; rank-1/rank-2 cells and the 6-dp margin must agree
    exactly."""
    from apache_beam_java_firestore_batch_dataflow_spark.operators.similarity import (
        IVF_BATCH_MOD,
        IVF_BATCH_REM,
        IVF_C,
        q_ann_ivf_incremental,
    )

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_pylist()
    embs = {i: np.array(e, dtype=np.float64) for i, e in zip(ids, t["embedding"].to_pylist())}

    def fold_dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += float(np.float64(x) * np.float64(y))
        return acc

    def norm(a):
        return float(np.sqrt(np.float64(fold_dot(a, a))))

    corpus = [i for i in ids if i % IVF_BATCH_MOD != IVF_BATCH_REM]
    batch = [i for i in ids if i % IVF_BATCH_MOD == IVF_BATCH_REM]
    cent_ids = sorted(corpus, key=lambda i: ((i * 1103515245 + 12345) % 2147483648, i))[
        :IVF_C
    ]
    norms = {i: norm(embs[i]) for i in ids}

    expected = {}
    for b in batch:
        sims = sorted(
            (
                (-(fold_dot(embs[b], embs[c]) / (norms[b] * norms[c])), c)
                for c in cent_ids
            ),
        )
        (s1, c1), (s2, c2) = sims[0], sims[1]
        expected[b] = (c1, round(-s1, 6), c2, round((-s1) - (-s2), 6))

    got = {
        r.vec_id: (r.cell, r.csim6, r.cell2, r.margin6)
        for r in q_ann_ivf_incremental(spark, sf_dir).collect()
    }
    assert got == expected
    assert got
    spark.catalog.clearCache()


def test_ivf_incremental_frozen_quantizer_plan(spark, sf_dir):
    """The corpus side must appear only as the TakeOrderedAndProject
    centroid selection (O(IVF_C) task state) feeding a BroadcastExchange
    — assignment is batch x constant-size-broadcast (the keyless join
    against the 64-row build side plans as BroadcastNestedLoopJoin
    BuildRight, the same bounded shape as q_ann_ivf's assignment pass);
    no shuffle-side cartesian of corpus rows."""
    from apache_beam_java_firestore_batch_dataflow_spark.operators import similarity
    from apache_beam_java_firestore_batch_dataflow_spark.plans.explain import plan_text

    df = similarity.QUERIES["q_ann_ivf_incremental"](spark, sf_dir)
    txt = plan_text(df, "simple")
    assert "TakeOrderedAndProject(limit=64" in txt, txt
    assert "BroadcastExchange" in txt, txt
    assert "CartesianProduct" not in txt
    # WindowGroupLimit: the rank-2 filter pushes below the exchange
    assert "WindowGroupLimit" in txt, txt
    spark.catalog.clearCache()


# ---------------------------------------------------------------------------
# q_dedup_paragraph_pairs
# ---------------------------------------------------------------------------


def test_paragraph_pairs_sound_and_nonempty(spark, sf_dir):
    """Soundness replay: every emitted pair's Jaccard is recomputed in
    Python from the raw text (re-chunk, re-shingle, exact set math) and
    must match the emitted 6-dp value and clear the threshold.  The
    fixture must produce at least one pair (the LSH bands are
    deterministic, so this is stable)."""
    from apache_beam_java_firestore_batch_dataflow_spark.operators.dedup import (
        PARA_JACC_MIN,
        PARA_TOKENS,
        SHINGLE_K,
        q_dedup_paragraph_pairs,
    )

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    shingles: dict[tuple, set] = {}
    for d, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        toks = _tokens(text)
        for pi, start in enumerate(range(0, len(toks), PARA_TOKENS)):
            ck = toks[start : start + PARA_TOKENS]
            s = {
                " ".join(ck[i : i + SHINGLE_K])
                for i in range(len(ck) - (SHINGLE_K - 1))
            }
            if s:
                shingles[(d, pi)] = s

    rows = q_dedup_paragraph_pairs(spark, sf_dir).collect()
    assert rows, "fixture must produce at least one paragraph-level pair"
    for r in rows:
        sa = shingles[(r.doc_a, r.para_a)]
        sb = shingles[(r.doc_b, r.para_b)]
        inter = len(sa & sb)
        assert inter == r.n_common, (r, inter)
        jac = inter / (len(sa) + len(sb) - inter)
        assert round(jac, 6) == r.jaccard6, (r, jac)
        assert jac >= PARA_JACC_MIN
    spark.catalog.clearCache()


def test_paragraph_pairs_no_pair_explosion(spark, sf_dir):
    """Candidates must come from the band equi-join only: no
    cartesian/nested-loop stage anywhere in the chunk + MinHash + verify
    pipeline (the q_dedup_minhash_lsh plan discipline at paragraph
    granularity)."""
    from apache_beam_java_firestore_batch_dataflow_spark.operators import dedup
    from apache_beam_java_firestore_batch_dataflow_spark.plans.explain import plan_text

    txt = plan_text(dedup.QUERIES["q_dedup_paragraph_pairs"](spark, sf_dir))
    assert "CartesianProduct" not in txt
    assert "BroadcastNestedLoopJoin" not in txt
    spark.catalog.clearCache()
