"""Tests for dedup / similarity / multimodal operators: planted-duplicate
recall, Python-oracle parity for the hash pipelines, Arrow decode plumbing.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from apache_beam_java_firestore_batch_dataflow_spark.functions.hashing import (
    H2_SALT,
    HEX_DIGITS,
    MERSENNE_P,
)
from apache_beam_java_firestore_batch_dataflow_spark.operators.dedup import (
    NUM_HASHES,
    SHINGLE_K,
    minhash_signatures,
    q_dedup_exact,
    shingles_df,
    simhash_signatures,
)
from apache_beam_java_firestore_batch_dataflow_spark.operators.multimodal import (
    decode_features,
    decode_payload,
    fake_decode_stats,
    multimodal_table,
)
from apache_beam_java_firestore_batch_dataflow_spark.operators.similarity import (
    KNN_K,
    q_knn_bruteforce,
)

SF_DIR = "/root/testdata/sf0.001"


def docs_df(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )


def py_h56(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:HEX_DIGITS], 16)


def py_shingles(text: str) -> set[str]:
    import re

    toks = [t for t in re.split(r"[\W\d_]+", text) if t]
    return {
        " ".join(toks[i : i + SHINGLE_K]) for i in range(len(toks) - SHINGLE_K + 1)
    }


def py_minhash(text: str) -> list[int]:
    pairs = [(py_h56(s), py_h56(H2_SALT + s)) for s in py_shingles(text)]
    return [
        min((h1 + i * h2 + i * i) % MERSENNE_P for h1, h2 in pairs)
        for i in range(NUM_HASHES)
    ]


TEXTS = [
    "the quick brown fox jumps over the lazy dog near the river bank",
    "the quick brown fox jumps over the lazy dog near the river shore",  # near-dup of 0
    "completely different content about spark query engines and shuffles",
    "the quick brown fox jumps over the lazy dog near the river bank",  # exact dup of 0
]


def test_minhash_signature_matches_python_oracle(spark):
    sigs = {
        r["doc_id"]: [r[f"m{i}"] for i in range(NUM_HASHES)]
        for r in minhash_signatures(docs_df(spark, TEXTS)).collect()
    }
    for doc_id in (0, 1, 2):
        assert sigs[doc_id] == py_minhash(TEXTS[doc_id]), doc_id


def test_minhash_near_dup_signatures_agree_mostly(spark):
    sigs = {
        r["doc_id"]: [r[f"m{i}"] for i in range(NUM_HASHES)]
        for r in minhash_signatures(docs_df(spark, TEXTS)).collect()
    }
    agree_near = sum(a == b for a, b in zip(sigs[0], sigs[1]))
    agree_far = sum(a == b for a, b in zip(sigs[0], sigs[2]))
    assert sigs[0] == sigs[3]  # exact dup -> identical signature
    assert agree_near > NUM_HASHES * 0.5  # high jaccard -> most hashes agree
    assert agree_far == 0


def test_shingles_distinct_and_correct(spark):
    got = {
        (r.doc_id, r.sh)
        for r in shingles_df(docs_df(spark, TEXTS[:1])).collect()
    }
    assert got == {(0, s) for s in py_shingles(TEXTS[0])}


def test_simhash_near_dup_hamming(spark):
    sigs = {r.doc_id: r.simhash for r in simhash_signatures(docs_df(spark, TEXTS)).collect()}
    ham = lambda a, b: bin(a ^ b).count("1")
    assert sigs[0] == sigs[3]
    assert ham(sigs[0], sigs[1]) <= 6
    assert ham(sigs[0], sigs[2]) > 6


def test_exact_dedup_collapses_planted_copy(spark, monkeypatch, tmp_path):
    # Route q_dedup_exact's table load through a planted frame by writing
    # a documents.parquet with a duplicate.
    df = docs_df(spark, TEXTS)
    out = str(tmp_path)
    df.withColumn("lang", F.lit("en")).withColumn("source", F.lit("t")).withColumn(
        "n_chars", F.length("text")
    ).write.mode("overwrite").parquet(f"{out}/documents.parquet")
    result = {r.doc_id: r.n_copies for r in q_dedup_exact(spark, out).collect()}
    assert result == {0: 2, 1: 1, 2: 1}  # doc 3 collapsed into doc 0


def test_knn_matches_numpy(spark):
    got = q_knn_bruteforce(spark, SF_DIR).collect()
    import duckdb

    vecs = dict(
        duckdb.connect()
        .execute(f"SELECT vec_id, embedding FROM '{SF_DIR}/embeddings.parquet'")
        .fetchall()
    )
    ids = sorted(vecs)
    mat = np.array([vecs[i] for i in ids], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)
    by_query: dict[int, list] = {}
    for r in got:
        by_query.setdefault(r.query_id, []).append(r)
    for qid, rows in by_query.items():
        qi = ids.index(qid)
        sims = (mat @ mat[qi]) / (norms * norms[qi])
        sims[qi] = -np.inf
        expected = sorted(
            ((float(sims[j]), ids[j]) for j in range(len(ids))),
            key=lambda t: (-t[0], t[1]),
        )[:KNN_K]
        got_pairs = [(r.neighbor_id, r.rank) for r in sorted(rows, key=lambda r: r.rank)]
        exp_pairs = [(nid, k + 1) for k, (_, nid) in enumerate(expected)]
        assert got_pairs == exp_pairs, qid
        for r in rows:
            exp_sim = expected[r.rank - 1][0]
            assert abs(r.cosine - round(exp_sim, 6)) < 1e-9


def test_multimodal_decode_plumbing(spark):
    mm = multimodal_table(spark, SF_DIR).limit(20)
    feats = decode_features(mm).collect()
    assert len(feats) == 20
    payloads = {r.doc_id: bytes(r.payload) for r in mm.collect()}
    for r in feats:
        mean_b, max_b, ent = fake_decode_stats(payloads[r.doc_id])
        assert r.n_bytes == len(payloads[r.doc_id])
        assert abs(r.mean_byte - mean_b) < 1e-12
        assert r.max_byte == max_b
        assert r.byte_entropy_bp == ent


def test_real_decoder_dispatch():
    from apache_beam_java_firestore_batch_dataflow_spark.operators.multimodal import (
        decode_ppm,
    )

    # audio/video stay stubbed (no codec libs in this environment)
    with pytest.raises(NotImplementedError):
        decode_payload(b"\x00\x01", "audio")
    with pytest.raises(NotImplementedError):
        decode_payload(b"\x00\x01", "video")
    # image dispatches to the real PPM parser; garbage is a parse error
    with pytest.raises(ValueError):
        decode_payload(b"\x00\x01", "image")
    # golden 2x1 image: pixels (1,2,3) and (250,251,252)
    img = b"P6\n2 1\n255\n" + bytes([1, 2, 3, 250, 251, 252])
    got = decode_payload(img, "image")
    assert got == {
        "width": 2,
        "height": 1,
        "raster_sum": 1 + 2 + 3 + 250 + 251 + 252,
        "r_sum": 1 + 250,
        "max_byte": 252,
    }
    # header comments + extra whitespace are tolerated (real PPM grammar)
    commented = b"P6\n# a comment\n 2\t1 # trailing\n255\n" + bytes(6)
    assert decode_ppm(commented)[:2] == (2, 1)
    # truncated raster and bad maxval fail loudly
    with pytest.raises(ValueError):
        decode_ppm(b"P6\n2 1\n255\n\x00\x01")
    with pytest.raises(ValueError):
        decode_ppm(b"P6\n1 1\n65535\n" + bytes(6))


def test_resize_stage_filters_and_bounds(spark):
    from apache_beam_java_firestore_batch_dataflow_spark.operators.multimodal import (
        TARGET_H,
        TARGET_W,
        resize_images,
    )

    mm = multimodal_table(spark, SF_DIR)
    out = resize_images(mm).collect()
    image_ids = {r.doc_id for r in mm.filter("modality = 'image'").collect()}
    assert {r.doc_id for r in out} == image_ids
    for r in out:
        assert (r.out_w, r.out_h) == (TARGET_W, TARGET_H)
        assert 0 < r.n_out_bytes <= TARGET_W * TARGET_H


def test_connected_components_small_graph(spark):
    from apache_beam_java_firestore_batch_dataflow_spark.operators.dedup import (
        connected_components,
    )

    vertices = spark.createDataFrame([(i,) for i in range(1, 7)], "doc_id long")
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "src long, dst long"
    )
    got = {
        r.doc_id: r.cluster_id for r in connected_components(vertices, edges).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 5, 6: 5}


def test_embedding_dedup_invariant_to_block_count(spark):
    """The block-pair kernel is a partitioning detail: changing
    N_SIM_BLOCKS must not change the result set (every pair evaluated
    exactly once, bit-identical sims)."""
    import apache_beam_java_firestore_batch_dataflow_spark.operators.similarity as sim

    def run():
        rows = sim.QUERIES["q_dedup_embedding_cosine"](spark, SF_DIR).collect()
        return sorted((r.vec_a, r.vec_b, r.cosine) for r in rows)

    base = run()
    orig = sim.N_SIM_BLOCKS
    try:
        sim.N_SIM_BLOCKS = 5
        assert run() == base
    finally:
        sim.N_SIM_BLOCKS = orig
    assert len(base) > 0


def test_ppm_decoder_roundtrip_property():
    """Property: any (w, h, raster, comment/whitespace layout) encodes to
    a P6 payload the decoder parses back exactly."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from apache_beam_java_firestore_batch_dataflow_spark.operators.multimodal import (
        decode_ppm,
    )

    @settings(max_examples=200, deadline=None)
    @given(
        w=st.integers(min_value=1, max_value=16),
        h=st.integers(min_value=1, max_value=16),
        data=st.data(),
        header_ws=st.sampled_from([b" ", b"\n", b"\t", b"\n# c\n"]),
        trailing=st.binary(max_size=8),
    )
    def check(w, h, data, header_ws, trailing):
        n = 3 * w * h
        raster = bytes(
            data.draw(st.lists(st.integers(0, 255), min_size=n, max_size=n))
        )
        payload = (
            b"P6" + header_ws + str(w).encode() + b" " + str(h).encode()
            + b"\n255\n" + raster + trailing  # trailing bytes must be ignored
        )
        got = decode_ppm(payload)
        assert got == (w, h, sum(raster), sum(raster[0::3]), max(raster))

    check()
