"""Loaders for the driver's deterministic parquet tables (TESTDATA.md).

Parquet scans get predicate pushdown + column pruning from Catalyst for
free; callers should select/filter *before* wide ops so the scan node
shows ``PushedFilters``/narrow ``ReadSchema`` (see plans/explain.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    # The driver's events.parquet stores ts as TIMESTAMP(NANOS), which Spark's
    # reader rejects unless nanosAsLong is on.  Callers (including the external
    # driver) may hand us a vanilla SparkSession, so set it here, not just in
    # session.py; the conf is runtime-settable and idempotent.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # Date/timestamp literals (e.g. TPC-H shipdate cuts) parse in the session
    # timezone; the DuckDB oracles assume UTC wall time.  Pin it here so a
    # non-UTC caller session cannot shift every date predicate by an offset.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    # TIMESTAMP(NANOS) columns arrive as long (see session.py nanosAsLong);
    # normalize to microsecond timestamps, matching DuckDB's ns->us truncation.
    from pyspark.sql import functions as F

    for field_name, dtype in df.dtypes:
        if field_name == "ts" and dtype == "bigint" and name == "events":
            df = df.withColumn(
                field_name, F.timestamp_micros(F.expr(f"{field_name} div 1000"))
            )
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for the SQL API."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
