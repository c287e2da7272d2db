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
