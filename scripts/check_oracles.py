#!/usr/bin/env python
"""Driver-gate rehearsal: run every ``queries()`` entry on Spark and its
``oracle_sql()`` on DuckDB over the same parquet tables, compare
row-count + column names + order-insensitive values.

Usage: python scripts/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # stabilize -0.0 / 17-digit noise: driver-style value normalization
        return f"{v:.10g}"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return str(v)


def rowset(rows):
    return sorted(tuple(norm(v) for v in row) for row in rows)


def _exceeds_float64_exact(type_str: str) -> bool:
    """True when a DuckDB output type can hold integers beyond 2^53 —
    the class the driver's pandas .df() path renders lossy (VERDICT r6:
    HUGEINT; r7: DECIMAL(38,0)).  Mirrors
    tests/test_driver_contract.py::_exceeds_float64_exact."""
    import re

    t = type_str.upper()
    if "HUGEINT" in t or "UBIGINT" in t:
        return True
    m = re.match(r"DECIMAL\((\d+)", t)
    return bool(m) and int(m.group(1)) > 18


def _head_stamp() -> str:
    """Tie the artifact to the exact tree it proves (ADVICE r3: the
    committed ORACLE_CHECK must be reproducibly linked to HEAD)."""
    import subprocess

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    try:
        head = subprocess.run(
            ["git", "rev-parse", "HEAD"], cwd=root, capture_output=True, text=True
        ).stdout.strip()
        # The artifact file itself is rewritten by the shell redirect
        # before this stamp runs — exclude exactly that one file (set via
        # ORACLE_ARTIFACT, e.g. ORACLE_CHECK_r05.txt) so a clean tree is
        # not reported dirty by its own proof run, while hand-edits to
        # any OTHER proof file still flag the tree as dirty.
        artifact = os.environ.get("ORACLE_ARTIFACT", "")
        status = subprocess.run(
            ["git", "status", "--porcelain"], cwd=root, capture_output=True, text=True
        ).stdout.splitlines()
        dirty = "\n".join(
            l for l in status if not (artifact and l[3:].strip() == artifact)
        ).strip()
        return f"HEAD {head}{' (dirty tree)' if dirty else ''}"
    except OSError:
        return "HEAD unknown (git unavailable)"


def main() -> int:
    from apache_beam_java_firestore_batch_dataflow_spark.session import build_session
    import __spark_entry__ as entrymod

    print(_head_stamp())
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    spark = build_session(app_name="oracle-check")

    con = duckdb.connect()
    for name in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{SF_DIR}/{name}.parquet'"
        )

    failures = []
    for name, fn in queries.items():
        if ONLY and name not in ONLY:
            continue
        t0 = time.monotonic()
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: spark error: {exc}")
            continue
        finally:
            # Queries that persist() an intermediate (TF-IDF weight maps,
            # winnow arrays) cache one frame per invocation; across a
            # 140+-query sweep that accumulates in executor storage
            # (ADVICE r5), so drop everything after each action.
            spark.catalog.clearCache()
        spark_s = time.monotonic() - t0
        if name not in oracles:
            print(f"okay {name}: rows-only ({len(srows)} rows, {spark_s:.1f}s) [no oracle]")
            continue
        try:
            rel = con.sql(oracles[name])
            # Driver-dtype guard (VERDICT r6+r7): output types that can
            # hold integers beyond 2^53 — HUGEINT/UHUGEINT/UBIGINT and
            # DECIMAL(p>18) — become lossy float64 under pandas .df(),
            # so the driver hashes rounded values while fetchall() (and
            # this rehearsal) sees exact ones.  Reject at the type
            # level before value-comparing.
            wide = [
                f"{c}:{t}"
                for c, t in zip(rel.columns, map(str, rel.types))
                if _exceeds_float64_exact(str(t))
            ]
            if wide:
                failures.append(name)
                print(
                    f"FAIL {name}: oracle output wider than float64-exact "
                    f"{wide} — CAST to BIGINT / VARCHAR or use bit_xor"
                )
                continue
            dcols = list(rel.columns)
            drows = rel.fetchall()
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {exc}")
            continue
        if sorted(scols) != sorted(dcols):
            failures.append(name)
            print(f"FAIL {name}: columns {scols} vs {dcols}")
            continue
        # align duckdb column order to spark order, then sort columns by name
        # like the driver does
        order = [dcols.index(c) for c in scols]
        drows = [tuple(row[i] for i in order) for row in drows]
        colsort = sorted(range(len(scols)), key=lambda i: scols[i])
        srows = [tuple(r[i] for i in colsort) for r in srows]
        drows = [tuple(r[i] for i in colsort) for r in drows]
        if len(srows) != len(drows):
            failures.append(name)
            print(f"FAIL {name}: rowcount {len(srows)} vs {len(drows)}")
            continue
        s_set, d_set = rowset(srows), rowset(drows)
        if s_set != d_set:
            failures.append(name)
            diff = [(a, b) for a, b in zip(s_set, d_set) if a != b][:3]
            print(f"FAIL {name}: value mismatch; first diffs: {diff}")
            continue
        print(f"PASS {name} ({len(srows)} rows, spark {spark_s:.1f}s)")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
