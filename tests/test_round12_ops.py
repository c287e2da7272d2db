"""Round-12 additions: fixture-fingerprint memo invalidation (ADVICE r11),
the eval-set contamination audit, sequence packing, PII scan, and the
epoch-audit zero-char guard.
"""

from __future__ import annotations

import os
import shutil

from .conftest import SF_DIR, sorted_rows


# ---------------------------------------------------------------------------
# fixture_fingerprint + memo invalidation on fixture rewrite (ADVICE r11)
# ---------------------------------------------------------------------------


def test_fixture_fingerprint_tracks_mtime_and_size(tmp_path):
    from apache_beam_java_firestore_batch_dataflow_spark.sources.tables import fixture_fingerprint

    src = os.path.join(SF_DIR, "orders.parquet")
    dst = tmp_path / "orders.parquet"
    shutil.copy(src, dst)
    fp1 = fixture_fingerprint(str(tmp_path), ("orders",))
    fp_again = fixture_fingerprint(str(tmp_path), ("orders",))
    assert fp1 == fp_again, "fingerprint must be stable when files are unchanged"
    os.utime(dst, ns=(os.stat(dst).st_mtime_ns + 1_000_000,) * 2)
    fp2 = fixture_fingerprint(str(tmp_path), ("orders",))
    assert fp2 != fp1, "an mtime bump must change the fingerprint"
    # a missing table is simply absent from the fingerprint, not an error
    assert fixture_fingerprint(str(tmp_path), ("lineitem",)) == repr([])


def test_copurchase_memo_invalidated_by_fixture_rewrite(spark, tmp_path):
    """A same-session rewrite of the fixture under the SAME sf_dir must
    miss the memo and rebuild from the new files — the ADVICE r11 stale
    checkpointed-blocks hazard (localCheckpoint bypasses
    spark.catalog.clearCache())."""
    from apache_beam_java_firestore_batch_dataflow_spark.operators.graph import (
        clear_copurchase_cache,
        copurchase_adj,
    )

    for name in ("orders", "lineitem"):
        shutil.copy(
            os.path.join(SF_DIR, f"{name}.parquet"),
            tmp_path / f"{name}.parquet",
        )
    clear_copurchase_cache()
    a = copurchase_adj(spark, str(tmp_path))
    assert copurchase_adj(spark, str(tmp_path)) is a, "unchanged fixture must hit"
    target = tmp_path / "orders.parquet"
    os.utime(target, ns=(os.stat(target).st_mtime_ns + 1_000_000,) * 2)
    b = copurchase_adj(spark, str(tmp_path))
    assert b is not a, "a fixture rewrite must invalidate the memo"
    assert copurchase_adj(spark, str(tmp_path)) is b
    clear_copurchase_cache()
    spark.catalog.clearCache()
