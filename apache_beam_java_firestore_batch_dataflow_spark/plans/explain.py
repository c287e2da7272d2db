"""Physical-plan inspection helpers.

The engine's scale claims — filters reach the parquet scan, projections
prune the read schema, dimension joins broadcast, narrow pipelines fuse
into whole-stage codegen, no accidental extra shuffles — are testable
properties of the plan text.  tests/test_plans.py pins them so a
refactor that silently drops a pushdown or upgrades a broadcast join to
a shuffle join fails CI, not the 100 TB run.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def plan_text(df: DataFrame, mode: str = "formatted") -> str:
    """The explain output as a string (what ``df.explain(mode)`` prints)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), mode
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """Every PushedFilters entry across the plan's file scans."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan_text(df)):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema struct strings, one per file scan."""
    return [m.group(1) for m in re.finditer(r"ReadSchema: (struct<[^\n]*)", plan_text(df))]


def num_shuffles(df: DataFrame) -> int:
    """Count of shuffle exchanges in the final (AQE-resolved) plan."""
    return len(re.findall(r"\bExchange hashpartitioning|\bExchange rangepartitioning|\bExchange RoundRobinPartitioning", plan_text(df, "simple")))


def num_broadcast_joins(df: DataFrame) -> int:
    """Broadcast joins of either flavor (hash for equi, nested-loop for
    non-equi conditions like kNN's self-pair exclusion)."""
    txt = plan_text(df, "simple")
    return txt.count("BroadcastHashJoin") + txt.count("BroadcastNestedLoopJoin")


def num_sortmerge_joins(df: DataFrame) -> int:
    return plan_text(df, "simple").count("SortMergeJoin")


def codegen_stage_count(df: DataFrame) -> int:
    """Number of distinct whole-stage-codegen spans (fused pipelines).

    Executes the plan first: under AQE the codegen annotations (``*(n)``
    in simple mode) only exist on the finalized plan.
    """
    df.collect()
    ids = set(re.findall(r"\*\((\d+)\)", plan_text(df, "simple")))
    return len(ids)
