"""Broadcastable Bloom filter over a key column — the runtime-filter
primitive (`q_bloom_semi_join` made reusable).

Build side: each key sets ``k`` md5-family probe bits in an ``m_bits``
filter; the bits aggregate into ``m_bits / 64`` int64 words with a
combiner-friendly ``bit_or`` and ONE bounded collect — driver state is
O(m_bits), a knob, never O(keys).  Probe side: membership is ``k``
codegen-friendly array lookups on the inlined word-array literal, so
non-members are dropped map-side before any shuffle.

False positives are possible by construction — callers must keep an
exact downstream filter (a join, or an exact count predicate) so the
Bloom is purely a shuffle-volume optimization and never changes
results.  Because no oracle ever replays this filter (unlike
``q_bloom_semi_join``, whose FP count is part of its checked output),
probes use ``xxhash64`` — a codegen-native hash ~50x cheaper per row
than the md5+conv family, which matters on the probe side where every
corpus row pays k probes.  Still fully deterministic across runs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BLOOM_WORD = 64  # bits per int64 word


_P31 = (1 << 31) - 1  # Mersenne residue keeps h1 + i*h2 + i² ANSI-overflow-safe


def _probe_positions(key: Column, m_bits: int, k: int) -> list[Column]:
    h1 = F.pmod(F.xxhash64(key), F.lit(_P31))
    h2 = F.pmod(F.xxhash64(key, F.lit("bloom2")), F.lit(_P31))
    return [
        F.pmod(h1 + h2 * F.lit(i) + F.lit(i * i), F.lit(m_bits))
        for i in range(k)
    ]


def bloom_build(keys: DataFrame, key: Column, m_bits: int, k: int) -> list[int]:
    """Aggregate the key column into the filter's word array.

    One distributed ``bit_or`` aggregation over at most
    ``m_bits / 64`` word rows, then an O(m_bits) collect — constant
    driver state regardless of key count.
    """
    pos = keys.select(F.explode(F.array(*_probe_positions(key, m_bits, k))).alias("pos"))
    words = (
        pos.select(
            (F.col("pos") / BLOOM_WORD).cast("int").alias("wi"),
            # shiftleft's Python signature takes only int numBits
            F.expr(f"shiftleft(1L, CAST(pos % {BLOOM_WORD} AS INT))").alias("bit"),
        )
        .groupBy("wi")
        .agg(F.bit_or("bit").alias("w"))
        .collect()
    )
    arr = [0] * (m_bits // BLOOM_WORD)
    for r in words:
        arr[r["wi"]] = r["w"]
    return arr


def bloom_member(key: Column, words: list[int], m_bits: int, k: int) -> Column:
    """Membership predicate: all ``k`` probe bits set.

    The word array ships as ONE array literal inside the plan (a
    broadcast-by-closure of m_bits/8 bytes); each probe is an
    element_at + getbit pair inside whole-stage codegen.
    """
    # force array<long>: small literals would otherwise infer int32 and
    # cap getbit positions at 32.  Built as ONE parsed SQL expression:
    # F.lit(list) creates a py4j Column per element (~1 ms each), which
    # for a 2048-word filter cost ~2.3 s of driver time PER DataFrame
    # construction (measured r12); the parser ingests the same 16 KiB
    # in milliseconds.  Values go through CAST('<w>' AS BIGINT) string
    # form so Long.MIN_VALUE survives (a bare -9223372036854775808L
    # literal is unary-minus-on-overflow to the SQL parser).
    ws = F.expr(
        "array(" + ",".join(f"CAST('{int(w)}' AS BIGINT)" for w in words) + ")"
    )
    member = None
    for p in _probe_positions(key, m_bits, k):
        wi = (p / BLOOM_WORD).cast("int")
        bit = (p % BLOOM_WORD).cast("int")
        hit = F.getbit(F.element_at(ws, wi + F.lit(1)), bit) == 1
        member = hit if member is None else member & hit
    return member
