"""Format matrix round-trips and partition pruning."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from apache_beam_java_firestore_batch_dataflow_spark.plans.explain import plan_text
from apache_beam_java_firestore_batch_dataflow_spark.sources.formats import (
    read_table,
    write_table,
)
from apache_beam_java_firestore_batch_dataflow_spark.sources.tables import load_table

from .conftest import sorted_rows

NATION_SCHEMA = "n_nationkey int, n_name string, n_regionkey int"


@pytest.mark.parametrize("fmt", ["parquet", "orc", "csv", "json"])
def test_roundtrip(spark, sf_dir, tmp_path, fmt):
    nation = load_table(spark, sf_dir, "nation")
    path = str(tmp_path / fmt)
    write_table(nation, path, fmt)
    back = read_table(spark, path, fmt, schema=NATION_SCHEMA)
    assert back.schema == nation.schema
    assert sorted_rows(back) == sorted_rows(nation)


def test_textual_formats_require_schema(spark, tmp_path):
    with pytest.raises(ValueError, match="explicit schema"):
        read_table(spark, str(tmp_path), "csv")
    with pytest.raises(ValueError, match="unsupported format"):
        read_table(spark, str(tmp_path), "avro")


def test_partitioned_write_prunes_directories(spark, sf_dir, tmp_path):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_returnflag"
    )
    path = str(tmp_path / "part")
    write_table(li, path, "parquet", partition_by=["l_returnflag"])
    filtered = read_table(spark, path, "parquet").filter(F.col("l_returnflag") == "R")
    txt = plan_text(filtered)
    assert "PartitionFilters" in txt and "l_returnflag" in txt.split("PartitionFilters:")[1].split("]")[0]
    got = filtered.agg(F.count(F.lit(1))).collect()[0][0]
    want = li.filter(F.col("l_returnflag") == "R").count()
    assert got == want
