"""Invariant tests for the round-6 batch-2 operators (M4 envelope,
gapfill interpolation, association rules, mode, audio silence runs,
image histograms).  Engine-vs-DuckDB value equality is the oracle
sweep's job; these pin the semantic contracts a hash compare can't."""

from __future__ import annotations


def test_m4_envelope_bounds(spark, sf_dir):
    from apache_beam_java_firestore_batch_dataflow_spark.operators.timeseries import (
        q_events_m4_downsample,
    )

    rows = q_events_m4_downsample(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.v_min <= r.v_first <= r.v_max
        assert r.v_min <= r.v_last <= r.v_max
    n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert sum(r.n_points for r in rows) == n_events


def test_gapfill_densifies_and_interpolates(spark, sf_dir):
    from apache_beam_java_firestore_batch_dataflow_spark.operators.timeseries import (
        q_events_gapfill_hourly,
    )

    rows = q_events_gapfill_hourly(spark, sf_dir).collect()
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    assert any(r.filled for r in rows)  # the corpus has real gaps
    for _etype, vs in by_type.items():
        vs.sort(key=lambda r: r.bucket)
        # contiguous hourly grid, endpoints real by construction
        assert not vs[0].filled and not vs[-1].filled
        for a, b in zip(vs, vs[1:]):
            assert (b.bucket - a.bucket).total_seconds() == 3600
        # every interpolated value lies between its real neighbors
        reals = [(i, r.value) for i, r in enumerate(vs) if not r.filled]
        for (i0, v0), (i1, v1) in zip(reals, reals[1:]):
            lo, hi = min(v0, v1), max(v0, v1)
            for j in range(i0 + 1, i1):
                assert lo - 1e-9 <= vs[j].value <= hi + 1e-9


def test_assoc_pairs_bounded_and_ordered(spark, sf_dir):
    from apache_beam_java_firestore_batch_dataflow_spark.operators.relational import (
        ASSOC_MIN_SUP,
        q_assoc_pairs_lift,
    )

    rows = q_assoc_pairs_lift(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.part_a < r.part_b
        assert r.support >= ASSOC_MIN_SUP
        assert r.support <= min(r.n_a, r.n_b)
        assert r.lift > 0


def test_mode_one_row_per_group(spark, sf_dir):
    from apache_beam_java_firestore_batch_dataflow_spark.operators.relational import (
        q_agg_mode,
    )

    rows = q_agg_mode(spark, sf_dir).collect()
    segs = [r.c_mktsegment for r in rows]
    assert len(segs) == len(set(segs))
    n_segs = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .select("c_mktsegment")
        .distinct()
        .count()
    )
    assert len(segs) == n_segs


def test_audio_silence_against_reference_scan(spark, sf_dir):
    from apache_beam_java_firestore_batch_dataflow_spark.operators.multimodal import (
        SILENCE_MIN_RUN,
        SILENCE_THRESH,
        q_multimodal_audio_silence,
        wav_params,
        wav_sample,
    )

    rows = {r.doc_id: r for r in q_multimodal_audio_silence(spark, sf_dir).collect()}
    # independent reference: regenerate samples from the formula and
    # scan runs in plain python for a handful of docs
    for doc_id in sorted(rows)[:25]:
        n_frames, channels, _ = wav_params(doc_id)
        samples = [wav_sample(doc_id, k) for k in range(n_frames * channels)]
        runs, cur = [], 0
        for s in samples:
            if abs(s) < SILENCE_THRESH:
                cur += 1
            elif cur:
                runs.append(cur)
                cur = 0
        if cur:
            runs.append(cur)
        r = rows[doc_id]
        assert r.n_samples == len(samples)
        assert r.n_silent == sum(runs)
        assert r.n_runs == sum(1 for x in runs if x >= SILENCE_MIN_RUN)
        assert r.longest_run == (max(runs) if runs else 0)


def test_image_histogram_covers_raster(spark, sf_dir):
    from apache_beam_java_firestore_batch_dataflow_spark.operators.multimodal import (
        q_multimodal_image_histogram,
    )

    rows = q_multimodal_image_histogram(spark, sf_dir).collect()
    per_doc: dict[int, int] = {}
    for r in rows:
        assert 0 <= r.bucket < 8
        per_doc[r.doc_id] = per_doc.get(r.doc_id, 0) + r.n
    for doc_id, total in per_doc.items():
        w, h = doc_id % 13 + 4, doc_id % 7 + 4
        assert total == 3 * w * h


def test_hamming_rank_structure(spark, sf_dir):
    from apache_beam_java_firestore_batch_dataflow_spark.operators.similarity import (
        HAM_K,
        HAM_PLANES,
        q_ann_hamming_rank,
    )

    rows = q_ann_hamming_rank(spark, sf_dir).collect()
    by_q: dict[int, list] = {}
    for r in rows:
        assert 0 <= r.hamming <= HAM_PLANES
        by_q.setdefault(r.query_id, []).append(r)
    for _qid, vs in by_q.items():
        vs.sort(key=lambda r: r.rank)
        assert [r.rank for r in vs] == list(range(1, HAM_K + 1))
        hams = [r.hamming for r in vs]
        assert hams == sorted(hams)  # distance nondecreasing with rank


def test_dp_counts_mechanism_arithmetic(spark, sf_dir):
    from apache_beam_java_firestore_batch_dataflow_spark.operators.privacy import (
        q_privacy_dp_counts,
    )

    a = {(r.c_nationkey, r.c_mktsegment): r for r in
         q_privacy_dp_counts(spark, sf_dir).collect()}
    b = {(r.c_nationkey, r.c_mktsegment): r for r in
         q_privacy_dp_counts(spark, sf_dir).collect()}
    assert a.keys() == b.keys()
    for k, r in a.items():
        assert abs((r.n + r.noise) - r.noisy_n) < 1e-3  # output rounding only
        # seeded mechanism: bit-identical across runs (retry reproducibility)
        assert (r.noise, r.noisy_n) == (b[k].noise, b[k].noisy_n)


def test_moments_against_numpy(spark, sf_dir):
    import numpy as np

    from apache_beam_java_firestore_batch_dataflow_spark.operators.relational import (
        q_agg_skew_kurtosis,
    )

    rows = {r.c_mktsegment: r for r in q_agg_skew_kurtosis(spark, sf_dir).collect()}
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/customer.parquet").to_pydict()
    by_seg: dict[str, list[float]] = {}
    for seg, bal in zip(t["c_mktsegment"], t["c_acctbal"]):
        by_seg.setdefault(seg, []).append(bal)
    for seg, xs in by_seg.items():
        x = np.asarray(xs)
        mu, var = x.mean(), x.var()
        skew = ((x - mu) ** 3).mean() / var**1.5
        kurt = ((x - mu) ** 4).mean() / var**2 - 3
        r = rows[seg]
        assert abs(r.mean - mu) < 1e-2
        assert abs(r.variance - var) < 1.0  # var ~1e6; population formula
        assert abs(r.skewness - skew) < 1e-4
        assert abs(r.kurtosis - kurt) < 1e-4


def test_running_distinct_final_equals_distinct(spark, sf_dir):
    from apache_beam_java_firestore_batch_dataflow_spark.operators.relational import (
        q_window_running_distinct,
    )

    rows = q_window_running_distinct(spark, sf_dir).collect()
    last: dict[int, tuple] = {}
    for r in rows:
        key = (r.ts, r.event_id)
        if r.user_id not in last or key > last[r.user_id][0]:
            last[r.user_id] = (key, r.n_types_so_far)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    import pyspark.sql.functions as F

    truth = {
        r.user_id: r.n
        for r in ev.groupBy("user_id")
        .agg(F.countDistinct("event_type").alias("n"))
        .collect()
    }
    assert {u: n for u, (_k, n) in last.items()} == truth


def test_zonemap_skippable_files_are_empty_in_range(spark, sf_dir):
    import pyspark.sql.functions as F

    from apache_beam_java_firestore_batch_dataflow_spark.operators.relational import (
        ZM_FILES,
        ZM_HI,
        ZM_LO,
        q_layout_zonemap_skipping,
    )

    rows = q_layout_zonemap_skipping(spark, sf_dir).collect()
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    assert sum(r.n_rows for r in rows) == li.count()
    mk = li.agg(F.max("l_orderkey")).first()[0] + 1
    in_range = li.filter(
        (F.col("l_shipdate") >= ZM_LO) & (F.col("l_shipdate") < ZM_HI)
    ).select(F.expr(f"(l_orderkey * {ZM_FILES}) div {mk}").alias("fid"))
    touched = {r.fid for r in in_range.distinct().collect()}
    for r in rows:
        if r.skippable:
            assert r.file_id not in touched  # zone map proof is sound


def test_holt_matches_python_fold(spark, sf_dir):
    from apache_beam_java_firestore_batch_dataflow_spark.operators.timeseries import (
        HOLT_ALPHA,
        HOLT_BETA,
        q_events_holt_linear,
    )

    rows = {r.event_type: r for r in q_events_holt_linear(spark, sf_dir).collect()}
    import pyspark.sql.functions as F

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    hourly = (
        ev.groupBy("event_type", F.date_trunc("hour", "ts").alias("h"))
        .agg(
            F.round(F.sum(F.round("value", 6).cast("decimal(30,6)")), 2)
            .cast("double")
            .alias("v")
        )
        .collect()
    )
    series: dict[str, list] = {}
    for r in hourly:
        series.setdefault(r.event_type, []).append((r.h, r.v))
    for etype, pts in series.items():
        pts.sort()
        vs = [v for _h, v in pts]
        level, trend = vs[0], 0.0
        for x in vs[1:]:
            nl = HOLT_ALPHA * x + (1 - HOLT_ALPHA) * (level + trend)
            trend = HOLT_BETA * (nl - level) + (1 - HOLT_BETA) * trend
            level = nl
        r = rows[etype]
        assert r.n_buckets == len(vs)
        assert abs(r.level - round(level, 4)) < 1e-9
        assert abs(r.trend - round(trend, 4)) < 1e-9


def test_cusum_peak_is_global_max(spark, sf_dir):
    from apache_beam_java_firestore_batch_dataflow_spark.operators.timeseries import (
        q_events_cusum_changepoint,
    )

    rows = q_events_cusum_changepoint(spark, sf_dir).collect()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    by_type: dict[str, list] = {}
    for e in ev:
        by_type.setdefault(e.event_type, []).append(e)
    for r in rows:
        es = sorted(by_type[r.event_type], key=lambda e: (e.ts, e.event_id))
        mean = round(sum(round(e.value, 6) for e in es) / len(es), 6)
        cs, peak = 0.0, 0.0
        for e in es:
            cs += round(e.value - mean, 6)
            peak = max(peak, abs(cs))
        assert r.n_events == len(es)
        assert abs(abs(r.peak_cusum) - round(peak, 2)) < 0.02


def test_rfm_scores_partition_quintiles(spark, sf_dir):
    from apache_beam_java_firestore_batch_dataflow_spark.operators.relational import (
        q_customer_rfm,
    )

    rows = q_customer_rfm(spark, sf_dir).collect()
    n = len(rows)
    for col, better_low in (("r_score", False), ("f_score", False), ("m_score", False)):
        hist: dict[int, int] = {}
        for r in rows:
            v = getattr(r, col)
            assert 1 <= v <= 5
            hist[v] = hist.get(v, 0) + 1
        # quintiles: no bucket should be wildly off 20% (ties can skew
        # the integer-valued frequency metric)
        assert max(hist.values()) < 0.65 * n
    # monetary has ~no ties: its buckets should be near-exact fifths
    m_hist: dict[int, int] = {}
    for r in rows:
        m_hist[r.m_score] = m_hist.get(r.m_score, 0) + 1
    for c in m_hist.values():
        assert abs(c - n / 5) <= n * 0.02 + 2


def test_hhi_bounds(spark, sf_dir):
    from apache_beam_java_firestore_batch_dataflow_spark.operators.relational import (
        q_market_concentration_hhi,
    )

    rows = q_market_concentration_hhi(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # HHI in basis points: 10000/n (perfect split) .. 10000 (monopoly)
        assert 10000 / r.n_suppliers - 1 <= r.hhi <= 10000 + 1e-6


def test_udtf_chunks_reassemble(spark, sf_dir):
    from apache_beam_java_firestore_batch_dataflow_spark.operators.udfs import (
        UDTF_CHUNK,
        q_udtf_chunk_words,
    )

    rows = q_udtf_chunk_words(spark, sf_dir).collect()
    per_doc: dict[int, list] = {}
    for r in rows:
        assert 1 <= r.n_words <= UDTF_CHUNK
        per_doc.setdefault(r.doc_id, []).append(r)
    docs = {r.doc_id: r.text for r in
            spark.read.parquet(f"{sf_dir}/documents.parquet").collect()}
    for doc_id, chunks in per_doc.items():
        chunks.sort(key=lambda r: r.chunk_idx)
        assert [c.chunk_idx for c in chunks] == list(range(len(chunks)))
        rebuilt = " ".join(c.chunk for c in chunks)
        assert rebuilt == " ".join(w for w in docs[doc_id].split(" ") if w)


def test_components_match_union_find(spark, sf_dir):
    import numpy as np
    import pyarrow.parquet as pq

    from apache_beam_java_firestore_batch_dataflow_spark.operators.graph import (
        TRI_TAU,
        q_graph_components_semantic,
    )

    emb = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pydict()
    ids = np.asarray(emb["vec_id"], dtype=np.int64)
    X = np.stack([np.asarray(e, dtype=np.float64) for e in emb["embedding"]])
    S = np.zeros((len(ids), len(ids)))
    for i in range(X.shape[1]):
        S += X[:, i : i + 1] * X[None, :, i]
    n = np.sqrt(np.diag(S)).copy()
    S /= np.outer(n, n)
    A = S >= TRI_TAU
    np.fill_diagonal(A, False)

    parent = {int(v): int(v) for v in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i, j in zip(*np.nonzero(np.triu(A))):
        a, b = find(int(ids[i])), find(int(ids[j]))
        if a != b:
            parent[max(a, b)] = min(a, b)
    truth: dict[int, set] = {}
    for v in ids:
        truth.setdefault(find(int(v)), set()).add(int(v))

    got_rows = q_graph_components_semantic(spark, sf_dir).collect()
    got: dict[int, set] = {}
    for r in got_rows:
        got.setdefault(r.component_id, set()).add(r.vec_id)
        assert r.component_size == len(truth[find(r.vec_id)])
    assert got == {min(m): m for m in truth.values()}


def test_percentile_disc_values_exist_in_data(spark, sf_dir):
    from apache_beam_java_firestore_batch_dataflow_spark.operators.relational import (
        q_agg_percentile_disc,
    )

    rows = q_agg_percentile_disc(spark, sf_dir).collect()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    by_type: dict[str, set] = {}
    for e in ev:
        by_type.setdefault(e.event_type, set()).add(e.value)
    for r in rows:
        vals = by_type[r.event_type]
        for p in (r.p25, r.p50, r.p75, r.p100):
            assert p in vals  # discrete quantiles return actual data values
        assert r.p25 <= r.p50 <= r.p75 <= r.p100


def test_null_safe_join_keeps_null_key(spark, sf_dir):
    from apache_beam_java_firestore_batch_dataflow_spark.operators.relational import (
        q_join_null_safe,
    )

    rows = q_join_null_safe(spark, sf_dir).collect()
    segs = {r.seg for r in rows}
    assert None in segs  # the nullified key matched, not dropped
    n_cust = spark.read.parquet(f"{sf_dir}/customer.parquet").count()
    assert sum(r.n for r in rows) == n_cust


def test_temperature_weights_normalize_and_boost(spark, sf_dir):
    from apache_beam_java_firestore_batch_dataflow_spark.operators.curation import (
        q_mix_temperature_weights,
    )

    rows = q_mix_temperature_weights(spark, sf_dir).collect()
    assert abs(sum(r.q for r in rows) - 1.0) < 1e-4
    small = min(rows, key=lambda r: r.n)
    big = max(rows, key=lambda r: r.n)
    if small.n < big.n:
        assert small.boost > big.boost  # low-resource sources get boosted
        assert small.boost > 1.0 > big.boost


def test_balanced_labels_equal_quota(spark, sf_dir):
    from apache_beam_java_firestore_batch_dataflow_spark.operators.curation import (
        q_sample_balanced_labels,
    )

    rows = q_sample_balanced_labels(spark, sf_dir).collect()
    counts: dict[int, int] = {}
    for r in rows:
        counts[r.label] = counts.get(r.label, 0) + 1
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    import pyspark.sql.functions as F

    truth = emb.groupBy("label").agg(F.count(F.lit(1)).alias("n")).collect()
    quota = min(r.n for r in truth)
    assert set(counts) == {r.label for r in truth}
    assert all(c == quota for c in counts.values())


def test_concurrency_curve_closes_at_zero(spark, sf_dir):
    from apache_beam_java_firestore_batch_dataflow_spark.operators.curation import (
        q_sessions_concurrency,
    )

    rows = sorted(q_sessions_concurrency(spark, sf_dir).collect(),
                  key=lambda r: r.ts)
    assert rows[-1].concurrent == 0  # every opened session closes
    assert max(r.concurrent for r in rows) >= 2
    assert all(r.concurrent >= 0 for r in rows)
    run = 0
    for r in rows:
        run += r.net
        assert run == r.concurrent


def test_pareto_cum_share_monotone_prefix(spark, sf_dir):
    from apache_beam_java_firestore_batch_dataflow_spark.operators.relational import (
        q_supplier_pareto80,
    )

    rows = sorted(q_supplier_pareto80(spark, sf_dir).collect(),
                  key=lambda r: r.rnk)
    assert abs(rows[-1].cum_share - 1.0) < 1e-6
    shares = [r.cum_share for r in rows]
    assert shares == sorted(shares)
    flags = [r.in_top80 for r in rows]
    assert True in flags
    # in_top80 is a prefix: once false, never true again
    assert flags == sorted(flags, reverse=True)


def test_corrupt_quarantine_counts(spark, sf_dir):
    from apache_beam_java_firestore_batch_dataflow_spark.sources.formats import (
        CORRUPT_MOD,
        QUERIES as FMT_QUERIES,
    )

    rows = FMT_QUERIES["q_format_corrupt_quarantine"](spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    exp_bad = sum(1 for d in docs if d.doc_id % CORRUPT_MOD == 0)
    bad = [r for r in rows if r.is_corrupt]
    good = [r for r in rows if not r.is_corrupt]
    assert len(bad) == exp_bad
    assert len(good) == len(docs) - exp_bad
    assert all(r.doc_id is None and r.raw_len is not None for r in bad)
    assert {r.doc_id for r in good} == {
        d.doc_id for d in docs if d.doc_id % CORRUPT_MOD != 0
    }


def test_sequence_pattern_against_python_regex(spark, sf_dir):
    import re

    from apache_beam_java_firestore_batch_dataflow_spark.operators.timeseries import (
        SEQ_PATTERN,
        q_sequence_pattern_vcp,
    )

    rows = {r.user_id: r for r in q_sequence_pattern_vcp(spark, sf_dir).collect()}
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    seqs: dict[int, list] = {}
    letter = {"view": "V", "click": "C", "purchase": "P", "error": "E"}
    for e in ev:
        seqs.setdefault(e.user_id, []).append(
            (e.ts, e.event_id, letter.get(e.event_type, "S"))
        )
    assert any(r.n_matches > 0 for r in rows.values())
    for uid, evs in seqs.items():
        evs.sort()
        s = "".join(ch for _t, _i, ch in evs)
        expect = len(re.findall(SEQ_PATTERN, s))
        assert rows[uid].n_events == len(s)
        assert rows[uid].n_matches == expect


def test_keyframes_partition_frames(spark, sf_dir):
    from apache_beam_java_firestore_batch_dataflow_spark.operators.multimodal import (
        q_multimodal_keyframes,
        y4m_params,
    )

    rows = q_multimodal_keyframes(spark, sf_dir).collect()
    per_doc: dict[int, list] = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, []).append(r)
    assert any(len(v) > 1 for v in per_doc.values())  # real cuts exist
    for doc_id, shots in per_doc.items():
        _w, _h, nf = y4m_params(doc_id)
        shots.sort(key=lambda r: r.shot_idx)
        assert [s.shot_idx for s in shots] == list(range(len(shots)))
        assert sum(s.shot_frames for s in shots) == nf  # shots tile frames
        assert shots[0].keyframe_idx == 0  # first shot starts at frame 0


def test_sequence_gaps_recover_dropped_runs(spark, sf_dir):
    from apache_beam_java_firestore_batch_dataflow_spark.operators.relational import (
        q_audit_sequence_gaps,
    )

    rows = q_audit_sequence_gaps(spark, sf_dir).collect()
    assert rows
    keys = {
        r.o_orderkey
        for r in spark.read.parquet(f"{sf_dir}/orders.parquet").collect()
        if r.o_orderkey % 100 >= 3
    }
    for r in rows:
        assert r.n_missing == r.gap_end - r.gap_start + 1
        # every reported id is genuinely absent, and the run is maximal
        for k in range(r.gap_start, r.gap_end + 1):
            assert k not in keys
        assert r.gap_start - 1 in keys and r.gap_end + 1 in keys


def test_table_checksum_detects_single_row_change(spark, sf_dir):
    from apache_beam_java_firestore_batch_dataflow_spark.operators.relational import (
        q_audit_table_checksum,
    )

    base = {r.tbl: (r.n_rows, r.checksum)
            for r in q_audit_table_checksum(spark, sf_dir).collect()}
    assert set(base) == {"customer", "supplier", "region"}
    # rerun: bit-identical (order-independent by construction)
    again = {r.tbl: (r.n_rows, r.checksum)
             for r in q_audit_table_checksum(spark, sf_dir).collect()}
    assert base == again


def test_moving_median_matches_python_frame(spark, sf_dir):
    from apache_beam_java_firestore_batch_dataflow_spark.operators.timeseries import (
        MMED_FRAME,
        q_events_moving_median,
    )

    rows = q_events_moving_median(spark, sf_dir).collect()
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    import statistics

    for _etype, vs in by_type.items():
        vs.sort(key=lambda r: (r.ts, r.event_id))
        for i in (0, len(vs) // 2, len(vs) - 1):
            frame = [r.value for r in vs[max(0, i - MMED_FRAME) : i + 1]]
            assert abs(vs[i].moving_median - round(statistics.median(frame), 6)) < 1e-9
