"""Approximate aggregates: sketch-based results land within documented
error bounds of the exact answer (the exact answer is the in-test oracle;
sketches are engine-specific so there is no cross-engine hash oracle)."""

from __future__ import annotations

from pyspark.sql import functions as F

from apache_beam_java_firestore_batch_dataflow_spark.sources.tables import load_table


def test_approx_count_distinct_bound(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    exact = li.select(F.countDistinct("l_orderkey")).collect()[0][0]
    approx = li.select(
        F.approx_count_distinct("l_orderkey", rsd=0.02)
    ).collect()[0][0]
    assert abs(approx - exact) / exact < 0.06  # 3 sigma of rsd=0.02


def test_percentile_approx_bound(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    exact = li.selectExpr("percentile(l_extendedprice, 0.5)").collect()[0][0]
    approx = li.selectExpr(
        "percentile_approx(l_extendedprice, 0.5, 10000)"
    ).collect()[0][0]
    assert abs(approx - exact) / exact < 0.01
