"""Round-17 optimization gates.

Each test pins one of the r17 performance/scale-safety fixes so it
cannot silently regress: spread_scan's fail-open contract on inputs its
row-group census cannot inspect (VERDICT r16 item 3 / ADVICE r16), the
nested-layout census recursion, and the checkpointed-kernel output
widths (VERDICT r16 item 1) added as the round's A/Bs land.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# spread_scan: fail OPEN on anything the census cannot inspect
# ---------------------------------------------------------------------------


def test_spread_scan_fails_open_on_non_posix_path(spark, sf_dir):
    """An object-store URI (or any path the local census cannot stat)
    must return the input UNCHANGED — never a corpus-wide repartition,
    never a raised error from os.stat/pyarrow."""
    from apache_beam_java_firestore_batch_dataflow_spark.sources.tables import (
        load_table,
        spread_scan,
    )

    df = load_table(spark, sf_dir, "orders").select("o_orderkey")
    out = spread_scan(
        df, spark, "s3://no-such-bucket/warehouse", "orders", key="o_orderkey"
    )
    assert out is df


def test_spread_scan_noop_when_census_finds_no_files(spark, tmp_path, sf_dir):
    """A directory layout with no visible data files is uninspectable,
    not unsplittable: total=0 must be a no-op (ADVICE r16 — the old
    code read an empty listing as 'fewer splits than cores' and would
    have repartitioned the full corpus at scale)."""
    from apache_beam_java_firestore_batch_dataflow_spark.sources.tables import (
        load_table,
        scan_data_splits,
        spread_scan,
    )

    os.makedirs(os.path.join(tmp_path, "orders.parquet", "_delta_log"))
    assert scan_data_splits(str(tmp_path), "orders") == 0
    df = load_table(spark, sf_dir, "orders").select("o_orderkey")
    out = spread_scan(df, spark, str(tmp_path), "orders", key="o_orderkey")
    assert out is df


def test_scan_data_splits_recurses_partitioned_layout(spark, tmp_path):
    """A hive-partitioned table keeps data files one directory level
    down; the census must find them (ADVICE r16: the flat listing saw 0
    files), and with >= cores row groups the spread stays a no-op."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from apache_beam_java_firestore_batch_dataflow_spark.sources.tables import (
        scan_data_splits,
        spread_scan,
    )

    cores = spark.sparkContext.defaultParallelism
    groups_per_part = (cores + 2) // 2  # 2 partitions -> cores+1 or +2 total
    root = os.path.join(tmp_path, "orders.parquet")
    for part in range(2):
        d = os.path.join(root, f"bucket={part}")
        os.makedirs(d)
        tbl = pa.table({"o_orderkey": list(range(groups_per_part * 4))})
        pq.write_table(tbl, os.path.join(d, "part-0.parquet"), row_group_size=4)
    assert scan_data_splits(str(tmp_path), "orders") == 2 * groups_per_part
    assert 2 * groups_per_part >= cores
    df = spark.read.parquet(root)
    out = spread_scan(df, spark, str(tmp_path), "orders", key="o_orderkey")
    assert out is df
