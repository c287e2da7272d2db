"""Bucketed co-located join: pre-partitioning both sides of a repeated
fact-fact join on the join key eliminates the per-query shuffle — the
standard layout investment for a 100 TB warehouse where orders⋈lineitem
runs daily."""

from __future__ import annotations

from pyspark.sql import functions as F

from apache_beam_java_firestore_batch_dataflow_spark.plans.explain import (
    num_shuffles,
    num_sortmerge_joins,
)
from apache_beam_java_firestore_batch_dataflow_spark.sources.tables import load_table

from .conftest import sorted_rows


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    import shutil

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("b_orders", "b_lineitem"):
        shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    (
        orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("b_orders")
    )
    (
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey")
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("b_lineitem")
    )

    bo = spark.table("b_orders")
    bl = spark.table("b_lineitem")
    joined = bo.join(bl, "o_orderkey").groupBy("o_custkey").agg(
        F.sum("l_quantity").alias("qty")
    )
    # At test scale Spark would broadcast; disable it so the plan shows
    # what a 100 TB fact-fact join would do: sort-merge directly on
    # co-located bucket files, no join-side exchange.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        assert num_sortmerge_joins(joined) == 1
        # the only exchange left is the final groupBy on o_custkey
        assert num_shuffles(joined) <= 1
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    plain = (
        load_table(spark, sf_dir, "orders")
        .join(
            load_table(spark, sf_dir, "lineitem").withColumnRenamed(
                "l_orderkey", "o_orderkey"
            ),
            "o_orderkey",
        )
        .groupBy("o_custkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    assert sorted_rows(joined) == sorted_rows(plain)
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
