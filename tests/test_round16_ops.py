"""Round-16 gates: the four r15 ADVICE fixes.

1. scripts/audit_parity.py keeps EVERY binding of a local name, not just
   the last — a name re-bound AFTER an ``F.round(q, k)`` call site used
   to resolve to the later value, hiding a division bound earlier.
2. The str-sum-mult supplementary scan requires the decimal/hugeint cast
   to COVER the product (wrap it or be an operand of the multiply)
   before auto-clearing as safe-decimal; a double product whose sum body
   merely mentions decimal in an unrelated nested cast must be flagged.
3. The bench selection-rule staleness bound compares sweep artifacts by
   ROUND NUMBER, not filename (lexicographic breaks at r100) — fixed in
   test_round15_ops.py::test_bench_covers_sweep_slowest_legs; here we
   pin the parser helper behavior indirectly via the exemption ledger
   contract.
4. scripts/check_scale_vacuity.py is wired into pytest mechanically: a
   committed, clean, HEAD-stamped VACUITY_CHECK_r{N}.txt artifact must
   exist and be no older than the newest committed sf0.1 sweep, so the
   empty-at-large-SF class cannot silently reopen.
"""

from __future__ import annotations

import ast
import glob
import importlib.util
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _audit_mod():
    spec = importlib.util.spec_from_file_location(
        "audit_parity", os.path.join(ROOT, "scripts", "audit_parity.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


# ---------------------------------------------------------------------------
# 1. multi-binding local-env resolution (ADVICE item 1)
# ---------------------------------------------------------------------------


def test_audit_env_keeps_every_binding():
    """The rebind-AFTER-use ordering that last-wins hid: ``q = a / b``,
    then the F.round(q) site, then ``q = lit(0)``.  Under last-wins the
    call site resolved q to the literal and the division was invisible;
    with all bindings kept, the site must flag."""
    ap = _audit_mod()
    src = (
        "def f():\n"
        "    q = a / b\n"
        "    out = F.round(q, 6)\n"
        "    q = F.lit(0)\n"
        "    return out, q\n"
    )
    tree = ast.parse(src)
    envs = ap._local_env(tree)
    fnode = tree.body[0]
    env = envs[id(fnode)]
    assert len(env["q"]) == 2, "both bindings of q must be kept"
    # the argument of the F.round call is the bare Name 'q'
    round_call = fnode.body[1].value
    assert ap._contains_resolved(round_call.args[0], ap._is_div, env), (
        "division bound BEFORE the call site must be reachable even "
        "though q is re-bound after it"
    )


def test_audit_env_rebind_still_finds_later_division():
    """Symmetric ordering: the division bound AFTER the call site is
    also checked (over-approximation — can only ADD sites)."""
    ap = _audit_mod()
    src = (
        "def f():\n"
        "    q = F.lit(0)\n"
        "    out = F.round(q, 6)\n"
        "    q = a / b\n"
        "    return out, q\n"
    )
    tree = ast.parse(src)
    envs = ap._local_env(tree)
    fnode = tree.body[0]
    round_call = fnode.body[1].value
    assert ap._contains_resolved(round_call.args[0], ap._is_div, envs[id(fnode)])


# ---------------------------------------------------------------------------
# 2. anchored decimal auto-clear for str-sum-mult (ADVICE item 2)
# ---------------------------------------------------------------------------


def test_decimal_anchor_rejects_unrelated_cast():
    """The r15 attack: a double product in a sum whose body merely
    MENTIONS decimal in an unrelated nested cast must NOT auto-clear."""
    ap = _audit_mod()
    assert not ap._decimal_anchors_mult("cast(x as decimal(38,0)) + y * z")
    assert not ap._decimal_anchors_mult("n * log_ratio_mu")
    assert not ap._decimal_anchors_mult(
        "cast(a as double) * b + cast(q as decimal(9,2))"
    )


def test_decimal_anchor_accepts_covering_casts():
    """The two legitimate shapes in the tree today: the cast WRAPS the
    product, or a decimal cast is an operand of the multiply (decimal
    propagates through *).  Postfix ::decimal/::hugeint count too."""
    ap = _audit_mod()
    assert ap._decimal_anchors_mult(
        "CAST(round((r.r / t.t) * (r.r / t.t) * 10000, 6) AS DECIMAL(38,6))"
    )
    assert ap._decimal_anchors_mult("cast(c as decimal(38,6)) * lp6")
    assert ap._decimal_anchors_mult("x * cast(y as decimal(38,0))")
    assert ap._decimal_anchors_mult("x::decimal(38,6) * y")
    assert ap._decimal_anchors_mult("x::hugeint * y")


def test_audit_exits_clean_at_head():
    """End-to-end: with both hardenings in, the census has not shrunk
    below the r15 judge-verified 92 sites (the multi-binding resolution
    over-approximates — it can only ADD) and every yielded site is still
    auto-cleared or ledgered (the main() contract the judge re-runs)."""
    ap = _audit_mod()
    sites = list(ap.collect())
    assert len(sites) >= 92, f"census shrank to {len(sites)} — sites lost"
    unledgered = [
        (rel, line, kind)
        for rel, line, kind, auto, seg in sites
        if auto is None
        and (os.path.basename(rel), ap._key(seg)) not in ap.LEDGER
    ]
    assert not unledgered, f"unledgered parity sites: {unledgered}"


# ---------------------------------------------------------------------------
# 4. vacuity gate wired into pytest (ADVICE item 4)
# ---------------------------------------------------------------------------


def _artifact_round(name: str, pat: str) -> int:
    m = re.search(pat, name)
    assert m, f"unparseable artifact name: {name}"
    return int(m.group(1))


def test_vacuity_gate_fresh_and_clean():
    """A committed VACUITY_CHECK_r{N}.txt must exist, report zero
    vacuous queries / zero errors / zero stale ledger rows over a
    full-registry census, and be at least as new as the newest
    committed sf0.1 sweep minus one round (the vacuity run is part of
    the same round close that produces the sweep; numeric compare per
    ADVICE item 3)."""
    vac = glob.glob(os.path.join(ROOT, "VACUITY_CHECK_r*.txt"))
    assert vac, "no committed VACUITY_CHECK artifact — run scripts/check_scale_vacuity.py"
    newest = max(vac, key=lambda p: _artifact_round(os.path.basename(p), r"_r(\d+)\."))
    vac_round = _artifact_round(os.path.basename(newest), r"_r(\d+)\.")
    body = open(newest).read()
    m = re.search(
        r"checked (\d+) oracles: (\d+) vacuous, (\d+) errors, (\d+) rows-only",
        body,
    )
    assert m, f"{newest} lacks the summary line — rerun the script"
    checked, vacuous, errors = int(m.group(1)), int(m.group(2)), int(m.group(3))
    assert checked >= 250, f"{newest} is not a full-registry census ({checked})"
    assert vacuous == 0, f"{newest} records {vacuous} vacuous queries"
    assert errors == 0, f"{newest} records {errors} DuckDB errors"
    assert "STALE exception ledger" not in body
    assert body.startswith("HEAD "), f"{newest} lacks the HEAD stamp"
    sweeps = glob.glob(os.path.join(ROOT, "ORACLE_CHECK_r*_SF01.txt"))
    if sweeps:
        newest_sweep = max(
            _artifact_round(os.path.basename(p), r"_r(\d+)_SF01") for p in sweeps
        )
        assert vac_round >= newest_sweep - 1, (
            f"vacuity artifact r{vac_round} is older than sweep r{newest_sweep} - 1 "
            f"— the gate was skipped at a round close"
        )
