"""Driver-contract guards over the WHOLE registry.

The external driver canonicalizes each query result by sorting all
columns in pandas and hashing the values; a complex-typed output column
(array/map/struct) makes that sort throw ``TypeError: unhashable type``
and burns the driver row (VERDICT r5: ``q_embedding_mrl_truncate`` and
``q_text_winnow_fingerprints`` were the first two).  This test turns
that failure class into a local test failure: every registered query's
output schema must be atomic-only.

Plan-building only — no job runs, so the sweep stays cheap even though
a handful of queries (PQ codebook, Bloom build) do bounded collects
while constructing their plan.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

import __spark_entry__ as entrymod

_COMPLEX = (T.ArrayType, T.MapType, T.StructType)


def _registry():
    return sorted(entrymod.queries().items())


@pytest.mark.parametrize("name,fn", _registry(), ids=[n for n, _ in _registry()])
def test_output_schema_is_atomic(spark, sf_dir, name, fn):
    df = fn(spark, sf_dir)
    bad = [
        f.name for f in df.schema.fields if isinstance(f.dataType, _COMPLEX)
    ]
    assert not bad, (
        f"{name} emits complex-typed column(s) {bad} "
        f"({[str(f.dataType) for f in df.schema.fields if f.name in bad]}); "
        "the driver's pandas canonicalizer cannot sort/hash these — "
        "explode to one row per element or emit a scalar digest instead"
    )
    # VERDICT r7: any numeric wider than float64's 53 exact bits is
    # lossy under the driver's pandas path even when BOTH engines
    # compute identical values (q_audit_table_checksum emitted
    # DECIMAL(38,0) sums ~5.4e19).  Reject Decimal(p>18) outputs here,
    # mirroring the oracle-side guard below.
    from pyspark.sql.types import DecimalType

    wide = [
        f"{f.name}:{f.dataType}"
        for f in df.schema.fields
        if isinstance(f.dataType, DecimalType) and f.dataType.precision > 18
    ]
    assert not wide, (
        f"{name} emits Decimal(p>18) column(s) {wide}; values beyond "
        "2^53 round under the driver's pandas canonicalizer — keep "
        "output integers within BIGINT (e.g. bit_xor instead of a wide "
        "sum) or emit VARCHAR"
    )
    spark.catalog.clearCache()


def _exceeds_float64_exact(type_str: str) -> bool:
    """True when a DuckDB output type can hold integers beyond 2^53 —
    the whole class the driver's pandas ``.df()`` path renders lossy:
    HUGEINT/UHUGEINT (r6, ``q_bloom_semi_join``), UBIGINT, and any
    DECIMAL with precision > 18 (r7, ``q_audit_table_checksum``:
    DECIMAL(38,0) sums ~5.4e19 coerced to float64)."""
    import re

    t = type_str.upper()
    if "HUGEINT" in t or "UBIGINT" in t:
        return True
    m = re.match(r"DECIMAL\((\d+)", t)
    return bool(m) and int(m.group(1)) > 18


def test_oracle_outputs_fit_float64_exact():
    """Bind every oracle in DuckDB (no execution) and reject output
    columns whose type exceeds float64's exact integer range.

    VERDICT r6: DuckDB ``sum(INTEGER)`` returns HUGEINT, which pandas
    ``.df()`` converts to float64, so the driver canonicalizes
    ``1529.0`` against Spark's ``1529`` and the value hash diverges
    even though both engines computed the identical integer
    (``q_bloom_semi_join``, r6's only red row).  VERDICT r7: the same
    class one type over — DECIMAL(38,0) checksum sums ~5.4e19 > 2^53
    coerced just as lossily.  The fetchall()-based rehearsal can never
    see either — Python ints/Decimals erase the dtype — so the guard
    lives at the type level: every oracle's OUTPUT boundary must stay
    within BIGINT/DOUBLE/DECIMAL(<=18).
    """
    import duckdb

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for name in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{sf}/{name}.parquet'")
    offenders = {}
    for name, sql in sorted(entrymod.oracle_sql().items()):
        rel = con.sql(sql)  # lazy relation: binds + types, no execution
        bad = [
            f"{c}:{t}"
            for c, t in zip(rel.columns, map(str, rel.types))
            if _exceeds_float64_exact(str(t))
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        f"oracles emitting wider-than-float64-exact output columns "
        f"{offenders}; pandas converts these to lossy float64 so the "
        "driver hash-compares rounded values — CAST to BIGINT, emit "
        "VARCHAR, or use an accumulator that stays 64-bit (bit_xor)"
    )


def test_every_query_has_matching_oracle_columns():
    """Names present in oracle_sql() must be a subset of queries() —
    a dangling oracle is a registration typo."""
    q = set(entrymod.queries())
    o = set(entrymod.oracle_sql())
    assert o <= q, f"oracles without queries: {sorted(o - q)}"


def test_coverage_doc_names_match_registry():
    """Every q_* mentioned in COVERAGE.md exists in the registry, and
    every registered query is mentioned in COVERAGE.md — the coverage
    inventory is the judge's checklist, so doc drift is a test failure,
    not a review finding."""
    import os
    import re

    registry = set(entrymod.queries())
    doc = open(os.path.join(os.path.dirname(__file__), "..", "COVERAGE.md")).read()
    mentioned = set(re.findall(r"\bq_[a-z0-9_]+\b", doc))
    # prose may reference TPC-H shorthand (q1..q22) — only q_* names checked
    ghosts = mentioned - registry
    assert not ghosts, f"COVERAGE.md names unknown queries: {sorted(ghosts)}"
    undocumented = {
        q for q in registry if q.startswith("q_") and q not in mentioned
    }
    assert not undocumented, f"registry queries missing from COVERAGE.md: {sorted(undocumented)}"
    # The headline "NNN registered queries" line must equal the actual
    # registry size — it drifted silently to 212-vs-235 once (ADVICE r8).
    m = re.search(r"(\d+) registered queries", doc)
    assert m, "COVERAGE.md lost its 'NNN registered queries' summary line"
    assert int(m.group(1)) == len(registry), (
        f"COVERAGE.md claims {m.group(1)} registered queries; "
        f"registry has {len(registry)}"
    )


def test_every_registered_query_has_committed_proof_row():
    """Freeze guard (VERDICT r8 item 3): every registered query must
    have a committed PASS/okay row in some ORACLE_CHECK_r*.txt.  The r8
    failure mode was registering queries AFTER the final oracle proof —
    doc-complete but proof-less at HEAD.  This test makes that a red
    suite: a registration commit must carry its proof row (run
    `python scripts/check_oracles.py /root/testdata/sf0.01 <name> ...`
    and append/commit the output into the current round's
    ORACLE_CHECK_rNN.txt in the SAME commit)."""
    import glob
    import os
    import re

    root = os.path.join(os.path.dirname(__file__), "..")
    proven = set()
    for path in glob.glob(os.path.join(root, "ORACLE_CHECK_r*.txt")):
        for line in open(path, encoding="utf-8", errors="replace"):
            m = re.match(r"(?:PASS|okay)\s+(\S+)", line)
            if m:
                proven.add(m.group(1))
    registry = set(entrymod.queries())
    unproven = sorted(registry - proven)
    assert not unproven, (
        f"registered queries with NO committed oracle-proof row anywhere: "
        f"{unproven} — run scripts/check_oracles.py on them and commit the "
        f"rows before (or with) the registration"
    )


def test_register_raises_on_duplicate_name():
    """Every module's register() must refuse an already-registered name.

    Round 9 silently shadowed q_format_schema_evolution because no
    register() guarded duplicates; registry.add now raises, and
    __spark_entry__._merge asserts the merged size equals the sum of
    module registry sizes (cross-module shadowing)."""
    import pytest as _pytest

    import __spark_entry__ as E

    from apache_beam_java_firestore_batch_dataflow_spark.sources import formats

    for mod in E._MODULES:
        reg = getattr(mod, "register", None) or mod._register
        some_name = next(iter(mod.QUERIES))
        with _pytest.raises(ValueError, match="duplicate query registration"):
            reg(some_name, "SELECT 1")(lambda spark, sf_dir: None)
    # formats.py uses a private _register with the same guard

    with _pytest.raises(ValueError, match="duplicate query registration"):
        formats._register("q_format_schema_evolution", "SELECT 1")(
            lambda spark, sf_dir: None
        )
    # the dead round-5 definition stays deleted: exactly one def in the file
    import inspect

    src = inspect.getsource(formats)
    assert src.count("def q_format_schema_evolution") == 1


def test_merged_registry_size_matches_module_sum():
    import __spark_entry__ as E

    total = sum(len(mod.QUERIES) for mod in E._MODULES)
    assert len(E.queries()) == total


def test_next_round_queue_ledger_names_resolve():
    """Every query name ledgered in the __spark_entry__ next-round-queue
    comment must exist in the registry — a typo there would waste a
    driver slot next round (the window is the scarce verification
    resource)."""
    import pathlib
    import re

    import __spark_entry__ as e

    src = pathlib.Path(e.__file__).read_text()
    marker = re.search(r"QUEUED FOR THE ROUND \d+ PREFIX", src)
    assert marker, "next-round queue marker comment missing from ledger"
    tail = src.find("_PRIORITY = [", marker.start())
    assert tail != -1, "_PRIORITY list must follow the queue marker"
    block = src[marker.start() : tail]
    names = set(re.findall(r"q[0-9a-z_]+", block))
    # strip comment words that merely look like names
    names = {n for n in names if n.startswith("q_") or re.fullmatch(r"q\d+_[a-z_]+", n)}
    registry = set(e.queries())
    missing = sorted(names - registry)
    assert not missing, f"r12-queue ledger names not in registry: {missing}"
