#!/usr/bin/env python
"""Scale-gate vacuity check (VERDICT r14 task 2).

The sf0.1 oracle sweep exists to catch threshold/boundary divergence on
10x data — but a query whose rowset is EMPTY at sf0.1 while non-empty
at sf0.01 passes that sweep vacuously (both engines agree on empty; the
cut itself is never exercised on actual rows).  r14 found two such
queries (q11_important_values with a fixed TPC-H fraction,
q_graph_jaccard_neighbors with a fixed Jaccard cut); both were made
scale-aware in r15.  This check keeps the class closed: it runs every
``oracle_sql()`` entry on DuckDB ONLY (no Spark — the cross-engine
value compare is check_oracles.py's job; vacuity is a property of the
rowset size) at BOTH scale factors and fails on any query that is
non-empty at the small SF but empty at the large one.

Empty at BOTH SFs is fine (genuinely-empty audits); empty small /
non-empty large is fine (the large gate exercises rows).  Queries with
no oracle (rows-only checks) are reported but cannot be asserted here.

Usage: python scripts/check_scale_vacuity.py [small_sf_dir] [large_sf_dir]
Exit 0 = no vacuous queries (modulo the EXCEPTIONS ledger); exit 1
otherwise.

Round-close artifact (r16, r15 ADVICE item 4): redirect the output to
``VACUITY_CHECK_r{N}.txt`` (set ``VACUITY_ARTIFACT`` to that filename so
the run's own redirect does not read as a dirty tree) and commit it —
``tests/test_round16_ops.py::test_vacuity_gate_fresh_and_clean`` asserts
the newest committed artifact is clean AND at most one round older than
the newest sf0.1 sweep, so silently skipping the gate fails pytest.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

SMALL = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
LARGE = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

# Queries ALLOWED to be non-empty small / empty large, each with the
# domain argument for why the emptiness is semantic rather than a
# threshold-calibration bug.  Empty on purpose: r15 de-vacuated both
# known cases instead of ledgering them.
EXCEPTIONS: dict[str, str] = {}


def _counts(sf_dir: str) -> dict[str, int | None]:
    import __spark_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    out: dict[str, int | None] = {}
    for name, sql in entrymod.oracle_sql().items():
        try:
            out[name] = con.execute(
                f"SELECT count(*) FROM ({sql})"
            ).fetchone()[0]
        except Exception as exc:  # noqa: BLE001
            print(f"ERROR {name}: duckdb error at {sf_dir}: {exc}")
            out[name] = None
    con.close()
    return out


def _head_stamp() -> str:
    """Tie the artifact to the exact tree it proves (the check_oracles.py
    pattern; VACUITY_ARTIFACT excludes the run's own redirect target)."""
    import subprocess

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    try:
        head = subprocess.run(
            ["git", "rev-parse", "HEAD"], cwd=root, capture_output=True, text=True
        ).stdout.strip()
        artifact = os.environ.get("VACUITY_ARTIFACT", "")
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
    import __spark_entry__ as entrymod

    print(_head_stamp())

    no_oracle = sorted(
        set(entrymod.queries()) - set(entrymod.oracle_sql())
    )
    small = _counts(SMALL)
    large = _counts(LARGE)
    vacuous, errors = [], []
    for name in sorted(small):
        s, l = small[name], large.get(name)
        if s is None or l is None:
            errors.append(name)
            continue
        if s > 0 and l == 0:
            if name in EXCEPTIONS:
                print(f"okay {name}: {s} -> 0 rows (ledgered: {EXCEPTIONS[name]})")
            else:
                vacuous.append(name)
                print(f"VACUOUS {name}: {s} rows at small SF, 0 at large")
    stale = sorted(set(EXCEPTIONS) - set(small))
    print(
        f"\nchecked {len(small)} oracles: {len(vacuous)} vacuous, "
        f"{len(errors)} errors, {len(no_oracle)} rows-only (unchecked: "
        f"{no_oracle})"
    )
    if stale:
        print(f"STALE exception ledger entries: {stale}")
    return 1 if (vacuous or errors or stale) else 0


if __name__ == "__main__":
    raise SystemExit(main())
