#!/usr/bin/env python
"""Cross-engine parity / overflow class audit (VERDICT r13 task 4).

Walks every non-test source file and AST-collects the two expression
classes the r13 sf0.1 sweep proved dangerous:

* ``F.round(expr, k)`` where ``expr`` contains a DIVISION — the
  round-on-double class: ``round(fl(p/q), k)`` flips between Spark
  (exact-binary BigDecimal HALF_UP) and DuckDB (double-multiply round)
  whenever p/q sits on — or within ~2^-52 relative of — an exact
  10^-k half.  For integer ratios that is REACHABLE: the reduced
  denominator q = 2^(k+1)·5^j makes p/q an exact half (j >= 1 is
  non-dyadic, so the two engines land on opposite sides).  The exact
  idiom is ``functions.numeric.round_ratio``.

* ``F.sum(expr)`` where ``expr`` contains a MULTIPLICATION — the int64
  accumulator-overflow class: ANSI Spark raises ARITHMETIC_OVERFLOW
  where DuckDB silently widens to int128, so only the Spark side fails
  at scale.  The exact idiom is a ``decimal(38,0)`` accumulator.

Every collected site must be ledgered below with a classification; an
UNLEDGERED site fails the audit (exit 1), so a future operator cannot
re-open either class silently.  Sites are keyed by (file, md5 of the
whitespace-normalized source segment) — line drift does not break the
ledger, editing the expression does (deliberately: a changed expression
needs re-classification).

Classifications:
  converted           rewritten to round_ratio / exact-int this round
  safe-k0             round to 0 dp: the only halves are m+0.5, exactly
                      representable dyadics — both engines see the exact
                      tie and round away from zero identically
  safe-transcendental the rounded value contains ln/sqrt/exp of
                      non-degenerate data: never an exact rational, so
                      no exact 10^-k half exists; the crossing band is
                      ~2^-52 relative — dual-SF sweeps stand as evidence
  safe-bounded        integer arithmetic with a documented domain bound
                      that keeps int64 exact (bound stated in reason)
  safe-decimal        accumulates in DECIMAL — exact and overflow-proof
                      to 10^38
  documented-float    deliberate double/float semantics (reason states
                      why: identical IEEE expression on both engines,
                      or TPC-H float aggregation with 10-sig-digit
                      normalization), dual-SF proven
  documented-bound    overflow reachable only past a stated corpus
                      bound that the output schema itself also caps

Usage: python scripts/audit_parity.py [--table]
Exit 0 = every site ledgered; prints the audit table (SCALE.md embeds
it).  Exit 1 = unledgered or stale-ledger sites, listed.
"""

from __future__ import annotations

import ast
import hashlib
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(ROOT, "apache_beam_java_firestore_batch_dataflow_spark")
SCAN_DIRS = ["operators", "streaming", "functions", "sources", "sinks"]

# NOTE: ``pow`` is deliberately ABSENT — pow(x, 2) of an integer ratio is
# rational and can sit on an exact 10^-k half, so a pow-containing round
# is NOT automatically transcendental (r14 ADVICE item 2); such sites
# must be ledgered with a domain argument like any other ratio.
_TRANS_NAMES = {"log", "log2", "log1p", "sqrt", "exp", "cbrt",
                "sin", "cos", "atan", "atan2", "expm1", "percent_rank"}


def _norm(seg: str) -> str:
    return " ".join(seg.split())


def _key(seg: str) -> str:
    return hashlib.md5(_norm(seg).encode()).hexdigest()[:10]


def _contains(node: ast.AST, pred) -> bool:
    return any(pred(n) for n in ast.walk(node))


def _is_div(n: ast.AST) -> bool:
    return isinstance(n, ast.BinOp) and isinstance(n.op, ast.Div)


def _is_mult(n: ast.AST) -> bool:
    return isinstance(n, ast.BinOp) and isinstance(n.op, ast.Mult)


def _is_trans(n: ast.AST) -> bool:
    if isinstance(n, ast.Call):
        f = n.func
        if isinstance(f, ast.Attribute) and f.attr in _TRANS_NAMES:
            return True
        if isinstance(f, ast.Name) and f.id in _TRANS_NAMES:
            return True
    return False


def _has_decimal_cast(seg: str) -> bool:
    s = _norm(seg).replace(" ", "")
    return 'cast("decimal' in s or "cast('decimal" in s


def _sum_mult_in_string(seg: str) -> list[str]:
    """Return the ``sum( ... )`` substrings of ``seg`` whose BODY contains
    a ``*`` — the overflow class hiding inside a SQL string fragment
    (round_ratio num/den, F.expr) where the AST scan cannot see the
    multiplication (r14 ADVICE item 2).  Paren-matched, case-insensitive."""
    out = []
    low = seg.lower()
    i = 0
    while True:
        j = low.find("sum(", i)
        if j < 0:
            break
        # reject identifiers ending in 'sum' (e.g. checksum() )
        if j > 0 and (low[j - 1].isalnum() or low[j - 1] == "_"):
            i = j + 4
            continue
        depth, k = 1, j + 4
        while k < len(seg) and depth:
            if seg[k] == "(":
                depth += 1
            elif seg[k] == ")":
                depth -= 1
            k += 1
        body = seg[j + 4 : k - 1]
        if "*" in body:
            out.append(_norm(seg[j:k]))
        i = k
    return out


def _cast_spans(body: str) -> list[tuple[int, int, bool]]:
    """Paren-matched ``cast( ... )`` spans in ``body`` (case-insensitive)
    as (start, end, is_decimal) — is_decimal when the cast's own target
    mentions decimal/hugeint (`` as decimal``/`` as hugeint``)."""
    low = body.lower()
    spans = []
    i = 0
    while True:
        j = low.find("cast(", i)
        if j < 0:
            break
        if j > 0 and (low[j - 1].isalnum() or low[j - 1] == "_"):
            i = j + 5
            continue
        depth, k = 1, j + 5
        while k < len(body) and depth:
            if body[k] == "(":
                depth += 1
            elif body[k] == ")":
                depth -= 1
            k += 1
        inner = low[j + 5 : k - 1]
        spans.append((j, k, "as decimal" in inner or "as hugeint" in inner))
        i = j + 5
    return spans


def _decimal_anchors_mult(body: str) -> bool:
    """True iff EVERY ``*`` in the sum body is covered by a decimal/
    hugeint cast — either inside a ``cast(... as decimal/hugeint)`` span
    (the product is computed then widened before accumulation) or with a
    decimal cast / ``::decimal``/``::hugeint`` operand immediately beside
    it (decimal propagates through the multiply).  Replaces the r15
    substring test (``'decimal' in frag``), which auto-cleared a double
    product whose body merely MENTIONED decimal in an unrelated nested
    cast (r15 ADVICE item 2)."""
    spans = _cast_spans(body)
    low = body.lower()
    for m, ch in enumerate(body):
        if ch != "*":
            continue
        # (a) inside a decimal cast span
        if any(s < m < e and dec for s, e, dec in spans):
            continue
        # (b) left operand is a decimal cast: `... cast(x as decimal) * y`
        #     or a `::decimal(p,s)` / `::hugeint` postfix
        l = m - 1
        while l >= 0 and body[l].isspace():
            l -= 1
        left_ok = low[: l + 1].endswith(("::hugeint", "::decimal"))
        if not left_ok and l >= 0 and body[l] == ")":
            if any(e - 1 == l and dec for _, e, dec in spans):
                left_ok = True
            else:
                # `)` may close a ::decimal(p,s) precision list
                depth, p = 1, l - 1
                while p >= 0 and depth:
                    if body[p] == ")":
                        depth += 1
                    elif body[p] == "(":
                        depth -= 1
                    p -= 1
                left_ok = depth == 0 and low[: p + 1].endswith("::decimal")
        # (c) right operand is a decimal cast: `x * cast(y as decimal)`
        r = m + 1
        while r < len(body) and body[r].isspace():
            r += 1
        right_ok = any(s == r and dec for s, _, dec in spans)
        if not (left_ok or right_ok):
            return False
    return True


def _is_frag_call(node: ast.Call) -> bool:
    """Calls whose string arguments are SQL fragments executed by BOTH
    engines or by Spark alone: round_ratio / round_ratio_sql /
    stable_avg(_sql) (fragment-taking numeric helpers) and F.expr."""
    f = node.func
    if isinstance(f, ast.Attribute):
        if isinstance(f.value, ast.Name) and f.value.id == "F" and f.attr == "expr":
            return True
        return f.attr in {"round_ratio", "round_ratio_sql", "stable_avg",
                          "stable_avg_sql"}
    if isinstance(f, ast.Name):
        return f.id in {"round_ratio", "round_ratio_sql", "stable_avg",
                        "stable_avg_sql"}
    return False


def _local_env(tree: ast.AST) -> dict[int, dict[str, list[ast.AST]]]:
    """Map id(function node) -> {name: [every assigned value AST]} for
    simple single-name assignments inside each function body.  Lets the
    scanner see through one common obfuscation of both classes:
    ``q = a / b`` followed by ``F.round(q, 6)`` — the Name node alone
    contains no Div, so the unresolved walk would silently clear the
    site (r15 hardening; the pre-conversion q_mix_temperature_weights
    ``q``/``boost`` locals were exactly this shape).

    EVERY binding of a name is kept, not just the last (r15 ADVICE):
    under last-wins, a name re-bound AFTER the F.round call site would
    resolve to the later value and a division bound earlier was hidden.
    Checking all bindings over-approximates (a binding not live at the
    call site may flag the site), which can only ADD sites to the
    ledgered census, never hide one."""
    envs: dict[int, dict[str, list[ast.AST]]] = {}
    for node in ast.walk(tree):
        if not isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            continue
        env: dict[str, list[ast.AST]] = {}
        for sub in ast.walk(node):
            if (
                isinstance(sub, ast.Assign)
                and len(sub.targets) == 1
                and isinstance(sub.targets[0], ast.Name)
            ):
                env.setdefault(sub.targets[0].id, []).append(sub.value)
        envs[id(node)] = env
    return envs


def _contains_resolved(node: ast.AST, pred, env: dict[str, list[ast.AST]]) -> bool:
    """_contains() that also follows Name references through ``env``
    (ALL bindings of each name, transitively, cycle-safe, depth-capped)."""
    seen: set[str] = set()
    stack = [node]
    depth = 0
    while stack and depth < 256:
        depth += 1
        cur = stack.pop()
        if _contains(cur, pred):
            return True
        for n in ast.walk(cur):
            if isinstance(n, ast.Name) and n.id in env and n.id not in seen:
                seen.add(n.id)
                stack.extend(env[n.id])
    return False


def collect():
    """Yield (relpath, lineno, kind, auto_class, segment) for every
    F.round / F.sum site of interest."""
    for d in SCAN_DIRS:
        base = os.path.join(PKG, d)
        if not os.path.isdir(base):
            continue
        for fn in sorted(os.listdir(base)):
            if not fn.endswith(".py"):
                continue
            path = os.path.join(base, fn)
            rel = os.path.relpath(path, ROOT)
            src = open(path).read()
            tree = ast.parse(src)
            envs = _local_env(tree)
            call_env: dict[int, dict[str, ast.AST]] = {}
            for fnode in ast.walk(tree):
                if isinstance(fnode, (ast.FunctionDef, ast.AsyncFunctionDef)):
                    for sub in ast.walk(fnode):
                        if isinstance(sub, ast.Call):
                            # inner functions visited after outer in
                            # ast.walk order, so the innermost env wins
                            call_env[id(sub)] = envs[id(fnode)]
            for node in ast.walk(tree):
                if not isinstance(node, ast.Call):
                    continue
                f = node.func
                if not (isinstance(f, ast.Attribute)
                        and isinstance(f.value, ast.Name)
                        and f.value.id == "F"):
                    continue
                env = call_env.get(id(node), {})
                # ast.get_source_segment is O(file) per call — extract
                # the segment only for sites that actually match (most
                # F.* calls are neither; this cut collect() ~70s -> ~2s)
                if f.attr == "round" and node.args:
                    arg = node.args[0]
                    k0 = len(node.args) < 2 or (
                        isinstance(node.args[1], ast.Constant)
                        and node.args[1].value == 0
                    )
                    if _contains_resolved(arg, _is_div, env):
                        if k0:
                            auto = "safe-k0"
                        elif _contains_resolved(arg, _is_trans, env):
                            auto = "safe-transcendental"
                        else:
                            auto = None  # ratio — must be ledgered
                        seg = ast.get_source_segment(src, node) or ""
                        yield rel, node.lineno, "round-div", auto, seg
                    # non-division rounds (per-row quantization, decimal
                    # re-rounding) share one blanket argument, printed in
                    # the table footer — not per-site ledgered.
                elif f.attr == "sum" and node.args:
                    arg = node.args[0]
                    if _contains_resolved(arg, _is_mult, env):
                        seg = ast.get_source_segment(src, node) or ""
                        auto = "safe-decimal" if _has_decimal_cast(seg) else None
                        yield rel, node.lineno, "sum-mult", auto, seg
            # Supplementary pass: sum-of-product INSIDE string SQL
            # fragments (round_ratio args, F.expr) — invisible to the
            # binop scan above.  Keyed by the normalized sum(...) text so
            # editing the fragment invalidates the ledger row.
            for node in ast.walk(tree):
                if not (isinstance(node, ast.Call) and _is_frag_call(node)):
                    continue
                for a in list(node.args) + [kw.value for kw in node.keywords]:
                    if not isinstance(a, (ast.Constant, ast.JoinedStr, ast.BinOp)):
                        continue
                    aseg = ast.get_source_segment(src, a) or ""
                    for frag in _sum_mult_in_string(aseg):
                        # anchored: the decimal/hugeint cast must cover
                        # the product itself, not merely appear anywhere
                        # in the sum body (r15 ADVICE item 2)
                        auto = (
                            "safe-decimal"
                            if _decimal_anchors_mult(frag[4:-1])
                            else None
                        )
                        yield rel, a.lineno, "str-sum-mult", auto, frag


# ---------------------------------------------------------------------------
# The ledger: every site the auto-classifier cannot clear, with the
# domain argument.  Key = (relpath basename, md5-10 of the normalized
# source segment).
# ---------------------------------------------------------------------------

LEDGER: dict[tuple[str, str], tuple[str, str]] = {
    # ---------------- round-div sites kept as round-of-double ----------
    # (the former curation.py boost/q entry was RETIRED in r15: w6/zsum
    # are 6dp-grid rationals, so both ratios were converted to exact
    # round_ratio — no float site remains to ledger)
    ("multimodal.py", "181cec573a"): (
        "documented-float",
        "Laplacian variance of 8-bit pixel data: moments are exact-int-"
        "valued doubles (<= 255^4/px); identical IEEE expression both "
        "engines; dual-SF proven",
    ),
    ("relational.py", "1aafc26ccc"): (
        "documented-float",
        "kurtosis composite of exact integer moments read as doubles; "
        "the exact rational exceeds DECIMAL(38); identical IEEE "
        "expression mirrored token-for-token; dual-SF proven",
    ),
    ("relational.py", "41cfcb7ff4"): (
        "documented-float",
        "OLS intercept (sy - slope*sx)/n: slope is already a double "
        "ratio, so no exact integer form below DECIMAL(38); identical "
        "IEEE expression both engines; dual-SF proven; exercised on a "
        "planted exact fixture by tests/test_round16_ops.py::"
        "test_ols_slope_dyadic_half_boundary",
    ),
    ("relational.py", "8b8bc34f58"): (
        "documented-float",
        "r^2 composite: cov^2/(var*var_y) of exact int sums read as "
        "doubles; exact form needs ~int256; identical IEEE both "
        "engines; dual-SF proven; exercised on a planted exact fixture "
        "by tests/test_round16_ops.py::test_ols_slope_dyadic_half_boundary",
    ),
    ("relational.py", "dc0e581212"): (
        "documented-float",
        "Gini final expression on exact decimal sums read as doubles; "
        "identical IEEE; dual-SF proven",
    ),
    ("relational.py", "069473cb68"): (
        "documented-float",
        "3x3 OLS determinant ratio from DECIMAL(38,0) sufficient "
        "stats; determinants exceed any decimal precision — computed "
        "in identical doubles both engines (r13 fix + sweep)",
    ),
    ("relational.py", "9f51d3fc7f"): (
        "documented-float",
        "see det0 entry — same determinant-ratio class",
    ),
    ("relational.py", "3a8f651da1"): (
        "documented-float",
        "see det0 entry — same determinant-ratio class",
    ),
    ("relational.py", "93f35876a7"): (
        "documented-float",
        "1 - SSE/SST on determinant-scale doubles; see det0 entry",
    ),
    ("similarity.py", "fc2073f2d3"): (
        "documented-float",
        "cosine of double data vectors: the fold and division are the "
        "identical IEEE sequence both engines; data-derived reals have "
        "no exact 10^-6-half form; dual-SF proven",
    ),
    ("similarity.py", "af8e7e4427"): (
        "safe-bounded",
        "maxabs/127: the reduced denominator 127*2^i carries no factor "
        "5 and keeps the odd 127, so NO exact 10^-9 half exists; a "
        "crossing-band near-miss needs 2^-52-relative proximity — "
        "measure-zero for data maxima; dual-SF proven",
    ),
    ("similarity.py", "c9784fcb2e"): (
        "safe-bounded",
        "min(units)/10^6 has EXACTLY 6 decimals (units are integer "
        "micro-units) — a 10^-6-grid value is never a 10^-6 half",
    ),
    ("text.py", "f0d492326f"): (
        "documented-float",
        "Flesch score: int ratios scaled by non-terminating decimal "
        "constants (1.015, 84.6); identical IEEE expression both "
        "engines; dual-SF proven",
    ),
    ("text.py", "41cfcb7ff4"): (
        "documented-float",
        "OLS intercept — same class as relational.py:41cfcb7ff4 "
        "(Zipf / Heaps regressions)",
    ),
    ("text.py", "40be08f53d"): (
        "documented-float",
        "regression intercept on micro-unit sums /1e6; slope already "
        "double; identical IEEE; dual-SF proven",
    ),
    ("timeseries.py", "49b0bc7127"): (
        "documented-float",
        "adev/mad: ratio of interpolated-median doubles (percentile "
        "parity pinned separately); identical IEEE division + round; "
        "boundary-proven in-repo at the exact dyadic 10^-6 half "
        "385/128 by tests/test_round16_ops.py::"
        "test_anomaly_mad_ratio_dyadic_half_boundary",
    ),
    ("timeseries.py", "c7927c8527"): (
        "documented-float",
        "robust-scale z = (value-med)/IQR on percentile doubles; "
        "identical IEEE; dual-SF proven; boundary-proven in-repo at "
        "exact dyadic 10^-6 halves (z = +-1/128, 3/128) by tests/"
        "test_round16_ops.py::test_robust_scale_z_dyadic_half_boundary",
    ),
    ("timeseries.py", "4cf629152b"): (
        "documented-float",
        "seasonality F-statistic composite on exact sums read as "
        "doubles; identical IEEE; dual-SF proven",
    ),
    ("timeseries.py", "8566be674b"): (
        "documented-float",
        "double mean scaled by the 10^6 quantization constant; "
        "identical IEEE expression both engines",
    ),
    ("timeseries.py", "88697fdb56"): (
        "documented-float",
        "sqrt-based sd scaled by 10^6; transcendental-valued",
    ),
    # -------- r15 name-resolution finds kept as round-of-double --------
    # (the scanner now sees through ``x = a / b; F.round(x, k)`` locals;
    # the integer-ratio finds were CONVERTED to round_ratio — these are
    # the residue with a genuine domain argument each)
    ("relational.py", "0182ea54ab"): (
        "documented-float",
        "variance m2 - m1^2 of 6dp-grid moment means: the exact form "
        "needs s1^2, beyond DECIMAL(38) at corpus scale (same class as "
        "the kurtosis row); identical IEEE expression both engines; "
        "dual-SF proven",
    ),
    ("relational.py", "638bf8ec47"): (
        "documented-float",
        "OLS slope cov_n/var_n on DECIMAL(38,0) sums read as doubles — "
        "the determinant-ratio class (see the intercept/r^2 rows); "
        "identical IEEE both engines; boundary-proven in-repo at the "
        "exact dyadic 10^-6 half slope = 1/128 by tests/"
        "test_round16_ops.py::test_ols_slope_dyadic_half_boundary",
    ),
    ("relational.py", "687d607972"): (
        "documented-float",
        "per-row share^2*10^4 quantization: share = r/t of 6dp-grid "
        "revenue aggregates; an exact 10^-6 half needs 2*10^10*R^2 = "
        "odd*T^2, impossible by 2-adic parity (v2(lhs) = 11+2*v2(R) "
        "is odd, v2(rhs) = 2*v2(T) is even) — UNREACHABLE for ALL "
        "6dp-grid (r, t), not merely real totals; the OUTER round of "
        "the decimal sum IS exact (round_ratio, r15); boundary-proven "
        "in-repo (dyadic share^2 terms + outer 10^-2 half) by tests/"
        "test_round16_ops.py::test_hhi_share_quantization_dyadic_boundary",
    ),
    ("text.py", "638bf8ec47"): (
        "documented-float",
        "Zipf/Heaps regression slopes — same determinant-ratio class "
        "as relational.py:638bf8ec47 (three sites share this key)",
    ),
    ("timeseries.py", "29dd262cc3"): (
        "documented-float",
        "gap-fill linear interpolation pv + (nv-pv)*dt/DT on DATA "
        "doubles (event values) — no group-size-driven rational "
        "structure; identical IEEE expression mirrored in the oracle; "
        "dual-SF proven; boundary-proven in-repo at exact dyadic "
        "10^-4 halves (10 + odd/32 slots) by tests/test_round16_ops"
        ".py::test_gapfill_interp_dyadic_half_boundary",
    ),
    ("privacy.py", "6f32dde100"): (
        "safe-bounded",
        "DP clamped sum: per-row cents = floor(clamped*100+0.5) <= "
        "DPSUM_CLAMP*100 per row; int64 group sums hold to ~9.2e18 "
        "summed cents (~$92T per nation) — widen to DECIMAL(38,0) "
        "past that (the r14 DP-sum re-basing class)",
    ),
    ("relational.py", "52b7a18c30"): (
        "safe-bounded",
        "ratio-to-report cents*(100-disc_pp): <= ~2e9 per row; int64 "
        "per-(nation,supplier) sums hold to ~4e9 rows per supplier — "
        "the docstring states the DECIMAL(38,0) widening point",
    ),
    # ---------------- str-sum-mult sites (SQL string fragments) --------
    ("curation.py", "c5063fc234"): (
        "safe-bounded",
        "KL contribution sum(n * log_ratio_mu): |log_ratio_mu| <= "
        "ln(100/min_pct * corpus)*1e6 ~ 4.5e7 micro-nats even at 1e12 "
        "docs, so the int64 sum holds to ~2e11 total docs — widen to "
        "DECIMAL(38,0) past that (stated widening point)",
    ),
    # ---------------- sum-mult sites kept on int64/double --------------
    ("dedup.py", "50d5692a61"): (
        "safe-bounded",
        "per-doc SimHash component: |sum cnt*(+-1)| <= the document's "
        "token count (~1e6) — int64-exact by construction",
    ),
    ("relational.py", "5d69de6158"): (
        "safe-bounded",
        "exact per-row cents (floor(x*100+0.5)); int64 sum holds to "
        "~9.2e18 summed cents per group (~$92T) — widen to "
        "DECIMAL(38,0) past that",
    ),
    ("relational.py", "716c83d063"): (
        "safe-bounded",
        "same exact-cents bound as the Theil site (~$92T per group)",
    ),
    ("relational.py", "6a0724dc9f"): (
        "safe-decimal",
        "sx/lix are DECIMAL(38,0) columns — the mixed expression "
        "promotes to decimal before summing",
    ),
    ("text.py", "0d3d377123"): (
        "safe-bounded",
        "per-DOC group: sum c*2e7 micro-nats <= doc tokens * 2e7 "
        "~ 2e13 — four orders inside int64",
    ),
    ("text.py", "2783472899"): (
        "safe-bounded",
        "Zipf regression: n <= ZIPF_TOP (model constant), terms are "
        "~2e7 micro-ln units squared -> sum <= ~4e16",
    ),
    ("text.py", "695f90b744"): (
        "safe-bounded",
        "see Zipf sxx entry — same constant-n bound",
    ),
    ("text.py", "1b5e648b74"): (
        "documented-bound",
        "pe_num OUTPUT column is declared BIGINT on both engines, so "
        "the schema itself caps validity at ~3e9 docs per language "
        "census; the int64 internal sum is exactly as wide as that "
        "output contract — widen both together if ever needed",
    ),
    ("timeseries.py", "78ed6939f1"): (
        "safe-bounded",
        "Theil-Sen median pick: at most TWO selected micro-slope terms "
        "per group (lo/hi ranks)",
    ),
    ("timeseries.py", "cf9d5903fc"): (
        "safe-bounded",
        "0/1 outlier-flag sum; the Mult sits inside the comparison "
        "predicate, not the accumulated term",
    ),
    ("timeseries.py", "e53635ce50"): (
        "documented-float",
        "hour-of-day energy: floor(1e6*s_g^2/n_g + 0.5) is an "
        "identical IEEE double expression both engines; the bigint "
        "cast holds while 1e6*s_g^2/n_g < 9.2e18 (hourly value sums "
        "to ~3e6*sqrt(n_g)) — stated widening point; boundary-proven "
        "in-repo at the exact dyadic .5 by tests/test_round15_ops.py::"
        "test_seasonality_energy_exact_half_boundary (r14 task 4)",
    ),
}


def main() -> int:
    sites = list(collect())
    rows = []
    missing = []
    used_keys = set()
    ledger = dict(LEDGER)
    for rel, lineno, kind, auto, seg in sites:
        base = os.path.basename(rel)
        key = (base, _key(seg))
        if auto is not None:
            rows.append((rel, lineno, kind, auto, ""))
            continue
        if key in ledger:
            cls, reason = ledger[key]
            used_keys.add(key)
            rows.append((rel, lineno, kind, cls, reason))
        else:
            missing.append((rel, lineno, kind, key[1], _norm(seg)[:100]))
    stale = [k for k in ledger if k not in used_keys]

    print(f"parity audit: {len(sites)} sites "
          f"({sum(1 for r in rows if r[2] == 'round-div')} round-div, "
          f"{sum(1 for r in rows if r[2] == 'sum-mult')} sum-mult, "
          f"{sum(1 for r in rows if r[2] == 'str-sum-mult')} str-sum-mult)")
    for rel, lineno, kind, cls, reason in sorted(rows):
        line = f"  {rel}:{lineno}  {kind:9s}  {cls}"
        if reason:
            line += f"  — {reason}"
        print(line)
    if missing:
        print("\nUNLEDGERED sites (classify in scripts/audit_parity.py):")
        for rel, lineno, kind, h, seg in missing:
            print(f"  {rel}:{lineno}  {kind}  key={h}  {seg}")
    if stale:
        print("\nSTALE ledger keys (site edited or removed — re-classify):")
        for k in stale:
            print(f"  {k}")
    return 1 if (missing or stale) else 0


if __name__ == "__main__":
    sys.exit(main())
