"""Unit tests for the reusable Bloom runtime-filter primitive
(``functions/bloom.py``) — build-side word aggregation and probe-side
membership, plus the two contract properties callers rely on: ZERO
false negatives (a dropped true member would change results) and a
bounded false-positive rate (FPs only cost shuffle rows; exact filters
downstream remove them)."""

from __future__ import annotations

from pyspark.sql import functions as F

from apache_beam_java_firestore_batch_dataflow_spark.functions.bloom import (
    BLOOM_WORD,
    bloom_build,
    bloom_member,
)

M_BITS = 1 << 14
K = 3


def test_bloom_no_false_negatives_and_bounded_fp(spark):
    members = spark.range(500).select(
        F.concat(F.lit("key-"), F.col("id")).alias("k")
    )
    words = bloom_build(members, F.col("k"), M_BITS, K)
    assert len(words) == M_BITS // BLOOM_WORD

    # every inserted key must pass
    n_members = members.filter(
        bloom_member(F.col("k"), words, M_BITS, K)
    ).count()
    assert n_members == 500

    # non-members: FP rate under ~4x the theoretical (1-e^(-kn/m))^k
    others = spark.range(10_000).select(
        F.concat(F.lit("other-"), F.col("id")).alias("k")
    )
    fp = others.filter(bloom_member(F.col("k"), words, M_BITS, K)).count()
    theoretical = (1 - 2.718281828 ** (-K * 500 / M_BITS)) ** K
    assert fp / 10_000 <= max(4 * theoretical, 0.01), fp


def test_bloom_deterministic_across_builds(spark):
    keys = spark.range(100).select(F.col("id").cast("string").alias("k"))
    w1 = bloom_build(keys, F.col("k"), M_BITS, K)
    w2 = bloom_build(keys.repartition(7), F.col("k"), M_BITS, K)
    assert w1 == w2  # partitioning-independent: bit_or is commutative


def test_bloom_empty_build_rejects_everything(spark):
    empty = spark.range(0).select(F.col("id").cast("string").alias("k"))
    words = bloom_build(empty, F.col("k"), M_BITS, K)
    assert all(w == 0 for w in words)
    probes = spark.range(100).select(F.col("id").cast("string").alias("k"))
    assert probes.filter(bloom_member(F.col("k"), words, M_BITS, K)).count() == 0
