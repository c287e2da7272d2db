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
    # 92 at the r15 judge re-run; 91 after the r16 HITS lineage fix
    # REMOVED the score·outdeg normalizer join (the multiply no longer
    # exists in the code — s is now the oracle's own Σraw over the
    # checkpointed frame, graph.py half_round).  Any further shrink is
    # a lost site until a named removal is recorded here.
    assert len(sites) >= 91, f"census shrank to {len(sites)} — sites lost"
    unledgered = [
        (rel, line, kind)
        for rel, line, kind, auto, seg in sites
        if auto is None
        and (os.path.basename(rel), ap._key(seg)) not in ap.LEDGER
    ]
    assert not unledgered, f"unledgered parity sites: {unledgered}"


# ---------------------------------------------------------------------------
# 3b. Python-worker host-band probe (VERDICT r15 item 3): the r15 driver
#     bench read q_ann_pq at 4.16 s vs 0.50 s local while every JVM
#     probe sat in-band — the four Python-kernel families (ann/knn/doc/
#     er) were 1.7-3.2x inflated and the JVM anchors could not see it.
#     The probe makes that window self-identify as "contended-python".
# ---------------------------------------------------------------------------


def test_host_band_python_probe_bands():
    sys.path.insert(0, ROOT)
    import bench

    jvm_clean = {
        "semantic_edges_shared": 1.7,
        "minhash_pairs_shared": 3.1,
        "copurchase_adj_shared": 1.3,
        "contamination_hits_shared": 2.6,
    }
    # the r15 driver signature: JVM probes in-band, python pool 3x slow
    hb = bench.host_band_signal(
        {"naive_sec": 1.6},
        jvm_clean,
        python_probe={"python_probe_cold_sec": 9.0, "python_probe_warm_sec": 1.5},
    )
    assert hb["band"] == "contended-python"
    assert hb["python_kernel_ratio"] > 2.0
    assert hb["python_kernel_cold_ratio"] > 2.0
    # quiet host: everything in-band
    hb = bench.host_band_signal(
        {"naive_sec": 1.5},
        jvm_clean,
        python_probe={"python_probe_cold_sec": 3.2, "python_probe_warm_sec": 0.5},
    )
    assert hb["band"] == "in-band"
    # JVM contention outranks the python label (the established verdicts
    # keep their meaning); no probe dict keeps pre-r16 behavior
    hb = bench.host_band_signal(
        {"naive_sec": 1.6},
        {"minhash_pairs_shared": 27.5},
        python_probe={"python_probe_cold_sec": 9.0, "python_probe_warm_sec": 1.5},
    )
    assert hb["band"] == "contended"
    hb = bench.host_band_signal({"naive_sec": 1.5}, jvm_clean)
    assert hb["band"] == "in-band"
    assert hb["python_kernel_ratio"] is None
    # uncalibrated configs stay uncalibrated regardless of the probe
    hb = bench.host_band_signal(
        {"naive_sec": 1.5},
        jvm_clean,
        calibrated=False,
        python_probe={"python_probe_cold_sec": 9.0, "python_probe_warm_sec": 1.5},
    )
    assert hb["band"] == "uncalibrated"


# ---------------------------------------------------------------------------
# 5. Planted-boundary tests for the reachability-argument ledger rows
#    (VERDICT r15 item 5): the three documented-float sites whose parity
#    rested on a written argument each get an in-repo boundary proof —
#    the r15 seasonality-dyadic / HHI-bounds precedent.
# ---------------------------------------------------------------------------


def _duck_views(tmp_path, *tables):
    import duckdb

    con = duckdb.connect()
    for t in tables:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{tmp_path}/{t}.parquet'")
    return con


def test_hhi_share_quantization_dyadic_boundary(spark, tmp_path):
    """audit_parity ledger row relational.py/687d607972: the per-row
    ``round(share^2 * 10^4, 6)`` stays float.  2-adic parity proof that
    NO exact 10^-6 half is reachable for ANY 6dp-grid (r, t): a tie
    needs 10^10*R^2/T^2 = odd/2, i.e. 2*10^10*R^2 = odd*T^2, but
    v2(2*10^10*R^2) = 11 + 2*v2(R) is ODD while v2(odd*T^2) = 2*v2(T)
    is EVEN — impossible.  Plant the nearest reachable boundary class
    instead: shares 1/80 and 79/80 make both share^2*10^4 terms exact
    DYADIC doubles (1.5625, 9751.5625) and push the OUTER exact round
    onto a true 10^-2 half (hhi6 = 9753.125 -> 9753.13 half-away via
    round_ratio on both engines)."""
    import pyarrow as pa
    import pyarrow.parquet as papq

    from apache_beam_java_firestore_batch_dataflow_spark.operators.relational import (
        q_market_concentration_hhi,
    )
    import __spark_entry__ as entrymod

    papq.write_table(
        pa.table(
            {
                "s_suppkey": pa.array([1, 2], pa.int64()),
                "s_nationkey": pa.array([7, 7], pa.int64()),
            }
        ),
        str(tmp_path / "supplier.parquet"),
    )
    papq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([1, 2], pa.int64()),
                "l_suppkey": pa.array([1, 2], pa.int64()),
                "l_extendedprice": pa.array([1.0, 79.0], pa.float64()),
                "l_discount": pa.array([0.0, 0.0], pa.float64()),
            }
        ),
        str(tmp_path / "lineitem.parquet"),
    )
    got = [tuple(r) for r in q_market_concentration_hhi(spark, str(tmp_path)).collect()]
    con = _duck_views(tmp_path, "supplier", "lineitem")
    want = [
        tuple(r)
        for r in con.execute(
            entrymod.oracle_sql()["q_market_concentration_hhi"]
        ).fetchall()
    ]
    con.close()
    assert got == want == [(7, 2, 9753.13)]
    # the planted ground truth: dyadic-exact share^2 terms, outer half
    assert (10000 * 1 * 1) / (80 * 80) == 1.5625
    assert (10000 * 79 * 79) / (80 * 80) == 9751.5625
    assert 1.5625 + 9751.5625 == 9753.125  # exact .5 at k=2


def test_gapfill_interp_dyadic_half_boundary(spark, tmp_path):
    """audit_parity ledger row for timeseries gap-fill interpolation:
    ``round(pv + (nv-pv)*dt/DT, 4)`` on data doubles.  Plant a 7-slot
    gap between hourly sums 10.00 and 10.25: every interpolated value
    is 10 + j/32 — exact dyadic doubles whose odd-j slots sit on TRUE
    10^-4 halves (10.03125, 10.09375, ...), the worst case for
    round-parity.  Both engines compute the identical IEEE expression
    and round the exact tie away from zero."""
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as papq

    from apache_beam_java_firestore_batch_dataflow_spark.operators.timeseries import (
        q_events_gapfill_hourly,
    )
    import __spark_entry__ as entrymod

    epoch = datetime.datetime(1970, 1, 1)
    papq.write_table(
        pa.table(
            {
                "event_id": pa.array([0, 1], pa.int64()),
                "ts": pa.array(
                    [epoch, epoch + datetime.timedelta(hours=8)],
                    pa.timestamp("us"),
                ),
                "user_id": pa.array([1, 1], pa.int64()),
                "event_type": pa.array(["dyadic", "dyadic"], pa.string()),
                "value": pa.array([10.0, 10.25], pa.float64()),
                "props": pa.array(["{}", "{}"], pa.string()),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    out = q_events_gapfill_hourly(spark, str(tmp_path)).collect()
    got = sorted((r["bucket"], r["filled"], r["value"]) for r in out)
    con = _duck_views(tmp_path, "events")
    want = sorted(
        (r[1], r[2], r[3])
        for r in con.execute(
            entrymod.oracle_sql()["q_events_gapfill_hourly"]
        ).fetchall()
    )
    con.close()
    assert got == want
    filled = [v for _, f, v in got if f]
    assert filled == [
        10.0313, 10.0625, 10.0938, 10.125, 10.1563, 10.1875, 10.2188
    ], "odd-j slots must round the exact dyadic half AWAY on both engines"
    assert 10 + 1 / 32 == 10.03125  # the planted tie is an exact double


def test_robust_scale_z_dyadic_half_boundary(spark, tmp_path):
    """audit_parity ledger row timeseries.py/c7927c8527: robust-scale
    ``round((value - med)/IQR, 6)`` on percentile doubles.  By the
    round-half lemma the only SAFE reachable 10^-6 ties are dyadic
    (reduced denominator 2^7): plant med = 0, IQR = 128 via exact
    percentile positions (n = 13, (n-1)*q integer, no interpolation)
    so z for values ±1 and 3 is ±1/128 and 3/128 — exact 10^-6 halves
    as exact doubles — and prove both engines round them away from
    zero, row-for-row."""
    import pyarrow as pa
    import pyarrow.parquet as papq

    from apache_beam_java_firestore_batch_dataflow_spark.operators.timeseries import (
        q_events_robust_scale,
    )
    import __spark_entry__ as entrymod

    vals = [-40, -20, -1, 0, 0, 0, 0, 1, 3, 128, 128, 150, 200]
    import datetime

    epoch = datetime.datetime(1970, 1, 1)
    papq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(len(vals)), pa.int64()),
                "ts": pa.array(
                    [epoch + datetime.timedelta(hours=i) for i in range(len(vals))],
                    pa.timestamp("us"),
                ),
                "user_id": pa.array([1] * len(vals), pa.int64()),
                "event_type": pa.array(["b"] * len(vals), pa.string()),
                "value": pa.array([float(v) for v in vals], pa.float64()),
                "props": pa.array(["{}"] * len(vals), pa.string()),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    out = q_events_robust_scale(spark, str(tmp_path)).collect()
    got = sorted((r["event_id"], r["value"], r["scaled"]) for r in out)
    con = _duck_views(tmp_path, "events")
    want = sorted(
        (r[0], r[2], r[3])
        for r in con.execute(
            entrymod.oracle_sql()["q_events_robust_scale"]
        ).fetchall()
    )
    con.close()
    assert got == want
    z = {v: s for _, v, s in got}
    # the three planted exact-dyadic 10^-6 halves, rounded away
    assert z[-1.0] == -0.007813 and z[1.0] == 0.007813
    assert z[3.0] == 0.023438
    assert 1 / 128 == 0.0078125 and 3 / 128 == 0.0234375
    # non-tie dyadic controls pass through exactly
    assert z[-40.0] == -0.3125 and z[200.0] == 1.5625


def _events_table(tmp_path, rows):
    """rows: list of (event_type, hour, value) — minimal events fixture."""
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as papq

    epoch = datetime.datetime(1970, 1, 1)
    papq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(len(rows)), pa.int64()),
                "ts": pa.array(
                    [epoch + datetime.timedelta(hours=h) for _, h, _ in rows],
                    pa.timestamp("us"),
                ),
                "user_id": pa.array([1] * len(rows), pa.int64()),
                "event_type": pa.array([t for t, _, _ in rows], pa.string()),
                "value": pa.array([float(v) for _, _, v in rows], pa.float64()),
                "props": pa.array(["{}"] * len(rows), pa.string()),
            }
        ),
        str(tmp_path / "events.parquet"),
    )


def test_anomaly_mad_ratio_dyadic_half_boundary(spark, tmp_path):
    """audit_parity ledger row timeseries.py/49b0bc7127: anomaly
    ``round(adev/mad, 6)`` on interpolated-median doubles.  Plant
    med = 0, mad = 128 (odd n, exact order statistics) and one outlier
    at 385 so the emitted dev_ratio is 385/128 = 3.0078125 — an exact
    dyadic 10^-6 half — and prove both engines round it away."""
    from apache_beam_java_firestore_batch_dataflow_spark.operators.timeseries import (
        q_events_anomaly_mad,
    )
    import __spark_entry__ as entrymod

    vals = [-128, 0, 0, 128, 385]
    _events_table(tmp_path, [("m", i, v) for i, v in enumerate(vals)])
    out = q_events_anomaly_mad(spark, str(tmp_path)).collect()
    got = sorted((r["event_id"], r["value"], r["dev_ratio"]) for r in out)
    con = _duck_views(tmp_path, "events")
    want = sorted(
        (r[0], r[2], r[3])
        for r in con.execute(
            entrymod.oracle_sql()["q_events_anomaly_mad"]
        ).fetchall()
    )
    con.close()
    assert got == want
    # exactly the planted outlier, with the tie rounded away
    assert got == [(4, 385.0, 3.007813)]
    assert 385 / 128 == 3.0078125  # the tie is an exact double


def test_ols_slope_dyadic_half_boundary(spark, tmp_path):
    """audit_parity ledger rows relational.py/638bf8ec47 (OLS slope
    cov_n/var_n), 41cfcb7ff4 (intercept), 8b8bc34f58 (r^2): the
    determinant-ratio class on DECIMAL sums read as doubles.  Plant two
    hourly points (x in {0, 8}) with y2 - y1 = 1/16 (a 6dp-grid value)
    so cov_n = 0.5, var_n = 64 and the slope is 1/128 = 0.0078125 — an
    exact dyadic 10^-6 half; the intercept lands exactly 1.0 and r^2
    runs the same composite on identical doubles."""
    from apache_beam_java_firestore_batch_dataflow_spark.operators.relational import (
        q_regress_trend_per_type,
    )
    import __spark_entry__ as entrymod

    _events_table(tmp_path, [("ols", 0, 1.0), ("ols", 8, 1.0625)])
    out = q_regress_trend_per_type(spark, str(tmp_path)).collect()
    got = [(r["event_type"], r["n"], r["slope"], r["intercept"], r["r2"]) for r in out]
    con = _duck_views(tmp_path, "events")
    want = [
        tuple(r)
        for r in con.execute(
            entrymod.oracle_sql()["q_regress_trend_per_type"]
        ).fetchall()
    ]
    con.close()
    assert got == want
    (typ, n, slope, intercept, r2), = got
    assert (typ, n) == ("ols", 2)
    assert slope == 0.007813, "the exact dyadic half must round AWAY"
    assert intercept == 1.0
    assert r2 == want[0][4]
    assert 0.5 / 64 == 0.0078125  # planted ground truth


# ---------------------------------------------------------------------------
# 6. Jaccard stage-count census (VERDICT r15 item 6)
# ---------------------------------------------------------------------------


def test_jaccard_stage_counts_census(spark):
    """The census mirrors the operator's own stages, enforces the
    C(df,2) blocking bound, and is wired into the bench's scaling
    artifact so the counts land in BENCH_LOCAL_r{N}.json."""
    from apache_beam_java_firestore_batch_dataflow_spark.operators.graph import (
        JACC_TOP_K,
        jaccard_stage_counts,
    )

    sc = jaccard_stage_counts(spark, "/root/testdata/sf0.001")
    assert set(sc) == {
        "adjacency_arcs",
        "rare_customers",
        "candidate_pair_bound",
        "candidate_pairs_distinct",
        "verified_pairs",
        "emitted_rows",
    }
    assert 0 < sc["candidate_pairs_distinct"] <= sc["candidate_pair_bound"]
    assert sc["verified_pairs"] == sc["candidate_pairs_distinct"]
    assert sc["emitted_rows"] == JACC_TOP_K
    # the bench must publish the census next to the timing curve
    src = open(os.path.join(ROOT, "bench.py")).read()
    assert "jaccard_stage_counts" in src and '"stage_counts"' in src


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
