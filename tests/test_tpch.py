"""Plan-shape + semantics tests for the TPC-H-pattern suite.

Value correctness for every query is hash-checked against DuckDB by the
driver (and ``scripts/check_oracles.py``); these tests pin the *physical
plan* properties the module's docstrings claim — the properties that
matter at 100 TB — plus the tie semantics that the oracle data may not
exercise at a given scale factor.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from apache_beam_java_firestore_batch_dataflow_spark.operators import tpch
from apache_beam_java_firestore_batch_dataflow_spark.plans.explain import (
    num_broadcast_joins,
    num_shuffles,
    plan_text,
    pushed_filters,
)


def test_registry_complete():
    """Every TPC-H query registered here carries a DuckDB oracle."""
    assert set(tpch.QUERIES) == set(tpch.ORACLES)
    assert len(tpch.QUERIES) == 19


def test_q6_filters_pushed_to_scan(spark, sf_dir):
    df = tpch.QUERIES["q6_forecast_revenue"](spark, sf_dir)
    filters = " ".join(pushed_filters(df))
    assert "l_shipdate" in filters and "l_discount" in filters
    assert "l_quantity" in filters
    # single-table aggregate: at most one exchange (partial -> final);
    # zero when the scan collapses to a single partition at small SF
    assert num_shuffles(df) <= 1


def test_q9_five_table_join_broadcasts_dims(spark, sf_dir):
    """part/supplier/nation broadcast; orders⋈lineitem is the only
    potential shuffle join."""
    df = tpch.QUERIES["q9_product_profit"](spark, sf_dir)
    assert num_broadcast_joins(df) >= 3
    assert "CartesianProduct" not in plan_text(df)


def test_q4_exists_becomes_semi_join(spark, sf_dir):
    txt = plan_text(tpch.QUERIES["q4_order_priority"](spark, sf_dir))
    assert "LeftSemi" in txt


def test_q16_not_in_becomes_anti_join(spark, sf_dir):
    txt = plan_text(tpch.QUERIES["q16_part_supplier_counts"](spark, sf_dir))
    assert "LeftAnti" in txt


def test_q10_topk_is_take_ordered(spark, sf_dir):
    """orderBy+limit must plan as TakeOrdered (per-partition heap), not a
    global sort of all customers."""
    txt = plan_text(tpch.QUERIES["q10_returned_items"](spark, sf_dir))
    assert "TakeOrderedAndProject" in txt


def test_no_cartesian_anywhere(spark, sf_dir):
    """Scalar subqueries are one-row broadcasts, never cross joins."""
    for name, fn in tpch.QUERIES.items():
        txt = plan_text(fn(spark, sf_dir))
        assert "CartesianProduct" not in txt, name


def test_q21_tie_semantics(spark, tmp_path):
    """Two suppliers tying the order's max shipdate BOTH count as "last
    shipper" (NOT EXISTS is strict-greater) — a case sf0.01 may not hit."""
    sf = str(tmp_path)
    li = spark.createDataFrame(
        [
            # order 1: s1 ships last alone -> only s1 counts
            (1, 101, 11, 1, 5.0, 100.0, 0.0, 0.0, "N", "O", "2000-01-05"),
            (1, 102, 12, 2, 5.0, 100.0, 0.0, 0.0, "N", "O", "2000-01-01"),
            # order 2: s1 and s2 tie at the max -> both count
            (2, 101, 11, 1, 5.0, 100.0, 0.0, 0.0, "N", "O", "2000-02-02"),
            (2, 102, 12, 2, 5.0, 100.0, 0.0, 0.0, "N", "O", "2000-02-02"),
            # order 3: single supplier -> EXISTS fails, nobody counts
            (3, 101, 11, 1, 5.0, 100.0, 0.0, 0.0, "N", "O", "2000-03-03"),
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string, l_shipdate string",
    ).withColumn("l_shipdate", F.col("l_shipdate").cast("timestamp"))
    orders = spark.createDataFrame(
        [(1, 1, "F", 1.0, "2000-01-01", "1-URGENT"),
         (2, 1, "F", 1.0, "2000-01-01", "1-URGENT"),
         (3, 1, "F", 1.0, "2000-01-01", "1-URGENT")],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate string, o_orderpriority string",
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp"))
    supp = spark.createDataFrame(
        [(11, "SUPP_11", 0, 1.0), (12, "SUPP_12", 0, 1.0)],
        "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
    )
    li.write.parquet(f"{sf}/lineitem.parquet")
    orders.write.parquet(f"{sf}/orders.parquet")
    supp.write.parquet(f"{sf}/supplier.parquet")

    out = {
        r["s_name"]: r["numwait"]
        for r in tpch.QUERIES["q21_last_shipper"](spark, sf).collect()
    }
    assert out == {"SUPP_11": 2, "SUPP_12": 1}
