"""Semantic tests for the round-8 operator batch — each new family gets
a property check against an independent computation (the test strategy
of SURVEY.md §5: golden/independent replication, not snapshot)."""

from __future__ import annotations

import re
from collections import Counter

import pyarrow.parquet as pq
from pyspark.sql import functions as F


def _py_bpe_train(vocab: Counter, k: int, sym_base: int = 0xE000):
    """Pure-Python reference for bpe_train: the Sennrich et al. loop
    over a (token -> corpus count) vocabulary, greedy-leftmost merge
    semantics (str.replace), ties on (count desc, pair asc)."""
    merges = []
    for i in range(k):
        census: Counter = Counter()
        for tok, cnt in vocab.items():
            for j in range(len(tok) - 1):
                census[tok[j : j + 2]] += cnt
        pair, n = min(census.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((i + 1, pair, n))
        sym = chr(sym_base + i)
        vocab = Counter(
            {tok.replace(pair, sym): cnt for tok, cnt in vocab.items()}
        )
    return merges


def test_bpe_train_k_rounds_bit_exact_vs_python(spark, sf_dir):
    """VERDICT r7 item 6: bpe_train(k) must reproduce the pure-Python
    trainer bit-exactly for k >= 4 — pair strings (including private-use
    merge symbols from earlier rounds), counts, and order."""
    from apache_beam_java_firestore_batch_dataflow_spark.operators.text import (
        bpe_train,
        q_text_bpe_train_k4,
    )

    # independent vocabulary census straight off the parquet file
    texts = pq.read_table(f"{sf_dir}/documents.parquet", columns=["text"])[
        "text"
    ].to_pylist()
    vocab: Counter = Counter()
    tok_re = re.compile(r"[^\W\d_]+", re.UNICODE)  # letters-only runs
    for t in texts:
        for tok in tok_re.findall(t.lower()):
            if len(tok) > 1:
                vocab[tok] += 1

    expected = _py_bpe_train(vocab, k=4)
    got = [
        (r.round, r.pair, r.n)
        for r in q_text_bpe_train_k4(spark, sf_dir).orderBy("round").collect()
    ]
    assert got == expected
    spark.catalog.clearCache()

    # deep run: k=6 through the checkpoint_every path, still bit-exact
    sdf = spark.createDataFrame(
        [(t, c) for t, c in vocab.items()], ["tok", "cnt"]
    )
    deep = [
        (r.round, r.pair, r.n)
        for r in bpe_train(sdf, k=6, checkpoint_every=2)
        .orderBy("round")
        .collect()
    ]
    assert deep == _py_bpe_train(vocab, k=6)
    spark.catalog.clearCache()


def test_bpe_train_learns_compound_merges(spark, sf_dir):
    """Later rounds may merge pairs CONTAINING earlier merge symbols —
    the mechanism by which BPE grows multi-character units.  On a
    synthetic vocabulary dominated by one long word, round 2's winner
    must contain round 1's symbol."""
    from apache_beam_java_firestore_batch_dataflow_spark.operators.text import (
        BPE_SYM_BASE,
        bpe_train,
    )

    vocab = [("abcd", 100), ("abce", 10), ("xy", 1)]
    sdf = spark.createDataFrame(vocab, ["tok", "cnt"])
    merges = {r.round: (r.pair, r.n) for r in bpe_train(sdf, k=3).collect()}
    assert merges[1] == ("ab", 110)
    sym1 = chr(BPE_SYM_BASE)
    # after ab -> sym1: tokens sym1+"cd" (100), sym1+"ce" (10), "xy" (1)
    assert merges[2] == (sym1 + "c", 110)
    sym2 = chr(BPE_SYM_BASE + 1)
    assert merges[3] == (sym2 + "d", 100)
    spark.catalog.clearCache()
