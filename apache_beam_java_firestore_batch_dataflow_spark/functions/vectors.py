"""Vector math over ``array<float>`` columns, built on JVM-side
higher-order functions (``zip_with`` / ``aggregate``) — no Python UDFs
in the hot path.

Determinism contract with the DuckDB oracle: every reduction is a
sequential left fold over the array (both engines), and every element is
cast to double before arithmetic, so dot products and norms are
bit-identical across engines.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ a[i]·b[i] as double (sequential left fold).

    Stays the higher-order-function form deliberately: unrolling to a
    64-term expression chain was measured SLOWER (the giant tree exceeds
    codegen method limits and falls back to interpreted ``element_at``
    with per-access bounds checks).  For O(n²) pair loops, the fast path
    is the order-faithful numpy kernel (operators/similarity.py
    ``_pairwise_sims``), which keeps the identical fold order while
    vectorizing across pairs.
    """
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def dot_sql(a_expr: str, b_expr: str) -> str:
    """DuckDB fragment computing the identical double dot product."""
    return (
        f"list_reduce(list_prepend(0.0, list_transform(range(1, len({a_expr}) + 1), "
        f"i -> CAST({a_expr}[i] AS DOUBLE) * CAST({b_expr}[i] AS DOUBLE))), "
        f"(acc, x) -> acc + x)"
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def norm_sql(a_expr: str) -> str:
    return f"sqrt({dot_sql(a_expr, a_expr)})"


def hyperplane_signs(n_planes: int, dim: int) -> list[list[int]]:
    """Deterministic ±1 hyperplane matrix for LSH bucketing.

    Sign(j, i) is derived from md5 of ``"plane:{j}:{i}"`` — reproducible
    from public knowledge of md5 alone, identical across any engine or
    language, and fixed across runs (a requirement for incremental
    indexing at scale: re-bucketing yesterday's 100 TB because the RNG
    seed changed is not an option).
    """
    signs: list[list[int]] = []
    for j in range(n_planes):
        row = []
        for i in range(dim):
            digest = hashlib.md5(f"plane:{j}:{i}".encode()).hexdigest()
            row.append(1 if int(digest[0], 16) % 2 == 0 else -1)
        signs.append(row)
    return signs
