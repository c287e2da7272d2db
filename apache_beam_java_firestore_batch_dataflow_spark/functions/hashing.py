"""Deterministic, engine-portable hashing primitives.

Every hash here is defined so the *identical* value is computable in
Spark SQL and in DuckDB SQL (the correctness oracle): md5 of a UTF-8
string, take the first 14 hex chars (56 bits, fits a signed 64-bit int
with headroom for the affine universal-hash family), parse as an integer.

Spark:  ``conv(substring(md5(s), 1, 14), 16, 10) :: bigint``
DuckDB: ``CAST('0x' || substr(md5(s), 1, 14) AS BIGINT)``

MinHash uses Kirsch-Mitzenmacher double hashing:
``h_i(x) = (H1(x) + i * H2(x) + i²) mod P`` with two independent 56-bit
md5 base hashes and ``P = 2^61 - 1``.  (A single-base affine family
``(a_i*H + b_i) mod P`` is NOT minwise-usable: for small ``a_i`` the
product rarely wraps P, so every ``h_i`` shares the same argmin shingle
and the 32 "independent" permutations collapse to ~1 — observed
empirically as signature agreement far below Jaccard.)  ``i*H2 < 31*2^56
< 2^61`` and the sum stays under 2^62 — no int64 overflow in either
engine.  Bit ``j`` of the base hash backs SimHash / hyperplane-LSH signs.

Why md5 and not Spark's ``xxhash64``/``hash``: those are not available
(or not bit-identical) in DuckDB, and the oracle gate hash-compares
values.  md5 on short tokens is plenty fast relative to the shuffle it
feeds, and at 100 TB the cost remains per-row CPU inside codegen — it
scales linearly and shuffles nothing extra.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HEX_DIGITS = 14  # 56 bits
MERSENNE_P = (1 << 61) - 1
H2_SALT = "mh2:"  # prefix making the second base hash independent of the first


def h56(col: Column, salt: str = "") -> Column:
    """56-bit integer hash of a string column (md5-prefix), Spark side."""
    if salt:
        col = F.concat(F.lit(salt), col)
    return F.conv(F.substring(F.md5(col), 1, HEX_DIGITS), 16, 10).cast("bigint")


def h56_sql(expr: str, salt: str = "") -> str:
    """DuckDB SQL fragment computing the identical 56-bit hash."""
    inner = f"'{salt}' || ({expr})" if salt else expr
    return f"CAST('0x' || substr(md5({inner}), 1, {HEX_DIGITS}) AS BIGINT)"


def minhash_term(h1: Column, h2: Column, i: int) -> Column:
    """Spark: ``(H1 + i*H2 + i²) mod P`` — the i-th minwise hash."""
    if not 0 <= i < 32:
        raise ValueError("hash family index out of range")
    return (h1 + h2 * F.lit(i) + F.lit(i * i)) % F.lit(MERSENNE_P)


def minhash_term_sql(h1_expr: str, h2_expr: str, i: int) -> str:
    if not 0 <= i < 32:
        raise ValueError("hash family index out of range")
    return f"(({h1_expr}) + ({h2_expr}) * {i} + {i * i}) % {MERSENNE_P}"


def bit_of(base: Column, j: int) -> Column:
    """Spark: bit j (0-based) of the 56-bit hash, as 0/1 int."""
    return F.shiftright(base, j).bitwiseAND(F.lit(1))


def bit_of_sql(base_expr: str, j: int) -> str:
    return f"((({base_expr}) >> {j}) & 1)"
