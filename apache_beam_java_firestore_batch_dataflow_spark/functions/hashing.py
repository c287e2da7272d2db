"""Deterministic, engine-portable hashing primitives.

Every hash here is defined so the *identical* value is computable in
Spark SQL and in DuckDB SQL (the correctness oracle): md5 of a UTF-8
string, take the first 14 hex chars (56 bits, fits a signed 64-bit int
with headroom for the affine universal-hash family), parse as an integer.

Spark:  ``conv(substring(md5(s), 1, 14), 16, 10) :: bigint``
DuckDB: ``CAST('0x' || substr(md5(s), 1, 14) AS BIGINT)``

The affine family ``h_i(x) = (a_i * H(x) + b_i) mod P`` with
``a_i = 2i + 3`` (≤ 65, so ``a_i * H < 2^62.1`` — no int64 overflow),
``b_i = i * SALT_B + 1``, ``P = 2^61 - 1`` backs MinHash signatures; bit
``j`` of the 56-bit base hash backs SimHash / hyperplane-LSH signs.

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
SALT_B = 769_231  # arbitrary fixed odd salt for the b_i offsets


def h56(col: Column) -> Column:
    """56-bit integer hash of a string column (md5-prefix), Spark side."""
    return F.conv(F.substring(F.md5(col), 1, HEX_DIGITS), 16, 10).cast("bigint")


def h56_sql(expr: str) -> str:
    """DuckDB SQL fragment computing the identical 56-bit hash."""
    return f"CAST('0x' || substr(md5({expr}), 1, {HEX_DIGITS}) AS BIGINT)"


def affine_params(i: int) -> tuple[int, int]:
    """(a_i, b_i) of the i-th universal hash; valid for 0 <= i < 32."""
    if not 0 <= i < 32:
        raise ValueError("hash family index out of range")
    return 2 * i + 3, i * SALT_B + 1


def minhash_term(base: Column, i: int) -> Column:
    """Spark: ``(a_i * H + b_i) mod P`` — the i-th hash of a shingle."""
    a, b = affine_params(i)
    return (base * F.lit(a) + F.lit(b)) % F.lit(MERSENNE_P)


def minhash_term_sql(base_expr: str, i: int) -> str:
    a, b = affine_params(i)
    return f"(({base_expr}) * {a} + {b}) % {MERSENNE_P}"


def bit_of(base: Column, j: int) -> Column:
    """Spark: bit j (0-based) of the 56-bit hash, as 0/1 int."""
    return F.shiftright(base, j).bitwiseAND(F.lit(1))


def bit_of_sql(base_expr: str, j: int) -> str:
    return f"((({base_expr}) >> {j}) & 1)"
