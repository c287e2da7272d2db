"""Oracle-stable numeric aggregation.

Floating-point ``sum``/``avg`` are order-dependent: Spark reduces across
partitions in nondeterministic order, DuckDB reduces sequentially, so raw
double aggregates differ in low-order bits and fail a value-hash compare.
The fix (used by both the Spark queries and their DuckDB oracle SQL):

1. round each term to ``TERM_SCALE`` decimals (per-row double op —
   deterministic and identical in both engines),
2. sum as DECIMAL (exact, order-independent),
3. round the total and cast to double.

This is not just test plumbing: exact decimal accumulation is also the
right call for money math at 100 TB, where a 600-billion-row double sum
drifts by whole cents.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TERM_SCALE = 6
OUT_SCALE = 2
DECIMAL_T = "decimal(30,6)"
DECIMAL_SQL = "DECIMAL(30,6)"


def stable_sum(term: Column, alias: str, out_scale: int = OUT_SCALE) -> Column:
    """Order-independent double sum of a double expression."""
    dec = F.round(term, TERM_SCALE).cast(DECIMAL_T)
    return F.round(F.sum(dec), out_scale).cast("double").alias(alias)


def stable_sum_sql(term_expr: str, alias: str, out_scale: int = OUT_SCALE) -> str:
    return (
        f"CAST(round(sum(CAST(round({term_expr}, {TERM_SCALE}) AS {DECIMAL_SQL})), "
        f"{out_scale}) AS DOUBLE) AS {alias}"
    )


def stable_avg(term: Column, alias: str, out_scale: int = 4) -> Column:
    """Order-independent double average: exact decimal sum / exact count."""
    dec = F.round(term, TERM_SCALE).cast(DECIMAL_T)
    return F.round(
        F.sum(dec).cast("double") / F.count(term), out_scale
    ).cast("double").alias(alias)


def stable_avg_sql(term_expr: str, alias: str, out_scale: int = 4) -> str:
    return (
        f"CAST(round(CAST(sum(CAST(round({term_expr}, {TERM_SCALE}) AS {DECIMAL_SQL}))"
        f" AS DOUBLE) / count({term_expr}), {out_scale}) AS DOUBLE) AS {alias}"
    )
