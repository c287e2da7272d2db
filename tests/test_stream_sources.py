"""Unbounded-source wiring: the rate source is a REAL unbounded stream
available in-sandbox; JDBC validates its parallel-read contract."""

from __future__ import annotations

import time

import pytest

from apache_beam_java_firestore_batch_dataflow_spark.sources.streams import (
    rate_stream,
    read_jdbc,
)


def test_rate_source_streams_windowed_counts(spark, tmp_path):
    from pyspark.sql import functions as F

    stream = rate_stream(spark, rows_per_second=50, num_partitions=2)
    assert stream.isStreaming
    agg = (
        stream.withWatermark("timestamp", "0 seconds")
        .groupBy(F.window("timestamp", "1 second"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        agg.writeStream.outputMode("update")
        .format("memory")
        .queryName("rate_counts")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        deadline = time.monotonic() + 30
        rows = []
        while time.monotonic() < deadline:
            q.processAllAvailable()
            rows = spark.sql("SELECT * FROM rate_counts").collect()
            if rows and sum(r.n for r in rows) >= 50:
                break
            time.sleep(0.5)
        assert rows, "rate source produced no windows"
        assert all(r.n > 0 for r in rows)
    finally:
        q.stop()


def test_jdbc_rejects_partial_partition_config(spark):
    with pytest.raises(ValueError, match="ALL of partition_column"):
        read_jdbc(
            spark,
            url="jdbc:postgresql://db/x",
            table="t",
            partition_column="id",
            num_partitions=8,
        )


def test_jdbc_partitioned_roundtrip_embedded_derby(spark, sf_dir, tmp_path):
    """REAL end-to-end JDBC: write supplier to the embedded Derby engine
    that ships in Spark's jars, read it back through read_jdbc's
    partitioned path — 4 strides means 4 scan partitions — and check the
    rows survive and a filter reaches the database as a pushed predicate."""
    from pyspark.sql import functions as F

    from apache_beam_java_firestore_batch_dataflow_spark.plans.explain import plan_text
    from apache_beam_java_firestore_batch_dataflow_spark.sources.tables import load_table

    # keep Derby's derby.log out of the repo cwd
    spark._jvm.System.setProperty("derby.system.home", str(tmp_path))
    url = f"jdbc:derby:{tmp_path}/jdbc_rt;create=true"
    driver = "org.apache.derby.jdbc.EmbeddedDriver"

    sup = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_acctbal"
    )
    (
        sup.write.format("jdbc")
        .option("url", url)
        .option("dbtable", "SUP")
        .option("driver", driver)
        .mode("overwrite")
        .save()
    )

    lo, hi = sup.agg(F.min("s_suppkey"), F.max("s_suppkey")).first()
    back = read_jdbc(
        spark,
        url=url,
        table="SUP",
        partition_column="s_suppkey",
        lower_bound=int(lo),
        upper_bound=int(hi) + 1,
        num_partitions=4,
        driver=driver,
    )
    assert back.rdd.getNumPartitions() == 4
    assert sorted(tuple(r) for r in back.collect()) == sorted(
        tuple(r) for r in sup.collect()
    )
    filtered = back.filter(F.col("s_suppkey") <= int(lo) + 3).select("s_name")
    txt = plan_text(filtered)
    assert "PushedFilters" in txt and "LessThanOrEqual" in txt, txt
    assert filtered.count() == sup.filter(F.col("s_suppkey") <= int(lo) + 3).count()


def test_kafka_reader_option_contract(spark):
    from apache_beam_java_firestore_batch_dataflow_spark.sources.streams import (
        read_kafka,
    )

    with pytest.raises(ValueError, match="bootstrap"):
        read_kafka(spark, "", subscribe="t")
    with pytest.raises(ValueError, match="exactly one"):
        read_kafka(spark, "broker:9092")
    with pytest.raises(ValueError, match="exactly one"):
        read_kafka(spark, "broker:9092", subscribe="t", assign='{"t":[0]}')


def test_kafka_like_stream_matches_kafka_schema(spark, tmp_path):
    """The stand-in must emit byte-for-byte the real Kafka source schema
    and carry messages through a consumer written against that schema."""
    import json

    from pyspark.sql import functions as F
    from pyspark.sql.types import _parse_datatype_string

    from apache_beam_java_firestore_batch_dataflow_spark.sources.streams import (
        KAFKA_SOURCE_SCHEMA,
        kafka_like_stream,
    )

    indir = tmp_path / "msgs"
    indir.mkdir()
    msgs = [
        {"key": f"k{i}", "value": f"payload-{i}", "partition": i % 2,
         "offset": i, "timestamp": f"2026-01-01T00:00:{i:02d}Z"}
        for i in range(6)
    ]
    (indir / "batch0.json").write_text("\n".join(json.dumps(m) for m in msgs))

    stream = kafka_like_stream(spark, str(indir), topic="docs")
    assert stream.isStreaming
    # same columns, same types, same order (the stand-in's constant topic/
    # timestampType columns are non-nullable, which is strictly tighter)
    want = _parse_datatype_string(KAFKA_SOURCE_SCHEMA)
    assert [(f.name, f.dataType) for f in stream.schema.fields] == [
        (f.name, f.dataType) for f in want.fields
    ]

    # a consumer written against the REAL kafka surface: value cast + dedup key
    consumed = stream.select(
        F.expr("CAST(key AS STRING)").alias("k"),
        F.expr("CAST(value AS STRING)").alias("v"),
        "topic",
        "partition",
        "offset",
    )
    q = (
        consumed.writeStream.format("memory")
        .queryName("kafka_like")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(60)
    finally:
        q.stop()
    rows = spark.sql("SELECT * FROM kafka_like ORDER BY offset").collect()
    assert [(r.k, r.v, r.topic, r.partition, r.offset) for r in rows] == [
        (f"k{i}", f"payload-{i}", "docs", i % 2, i) for i in range(6)
    ]


def test_cdc_merge_against_jdbc_snapshot(spark, sf_dir, tmp_path):
    """The production CDC pattern end-to-end: the snapshot lives in a
    database (embedded Derby), is read through read_jdbc's partitioned
    path, and the same merge_changes applied to it must equal the
    registered parquet-based q_cdc_merge_upsert row-for-row."""
    from pyspark.sql import functions as F

    from apache_beam_java_firestore_batch_dataflow_spark.operators.relational import (
        QUERIES,
        merge_changes,
    )
    from apache_beam_java_firestore_batch_dataflow_spark.sources.tables import load_table

    spark._jvm.System.setProperty("derby.system.home", str(tmp_path))
    url = f"jdbc:derby:{tmp_path}/cdc_rt;create=true"
    driver = "org.apache.derby.jdbc.EmbeddedDriver"

    c = load_table(spark, sf_dir, "customer")
    base = c.select("c_custkey", "c_name", "c_acctbal")
    (
        base.write.format("jdbc")
        .option("url", url)
        .option("dbtable", "CUST_SNAP")
        .option("driver", driver)
        .mode("overwrite")
        .save()
    )
    lo, hi = base.agg(F.min("c_custkey"), F.max("c_custkey")).first()
    jdbc_base = read_jdbc(
        spark,
        url=url,
        table="CUST_SNAP",
        partition_column="c_custkey",
        lower_bound=int(lo),
        upper_bound=int(hi) + 1,
        num_partitions=4,
        driver=driver,
    ).select("c_custkey", "c_name", "c_acctbal")

    # the registered query's synthesized feed, rebuilt against parquet
    updates = c.filter(F.col("c_custkey") % 7 == 0).select(
        "c_custkey",
        F.lit("U").alias("op"),
        "c_name",
        F.round(F.col("c_acctbal") + 100.0, 2).cast("double").alias("c_acctbal"),
    )
    deletes = c.filter(
        (F.col("c_custkey") % 11 == 0) & (F.col("c_custkey") % 7 != 0)
    ).select(
        "c_custkey",
        F.lit("D").alias("op"),
        F.lit(None).cast("string").alias("c_name"),
        F.lit(None).cast("double").alias("c_acctbal"),
    )
    inserts = c.filter(F.col("c_custkey") % 13 == 0).select(
        (F.col("c_custkey") + 1000000).alias("c_custkey"),
        F.lit("I").alias("op"),
        F.concat(F.lit("Customer#NEW"), F.col("c_custkey").cast("string")).alias(
            "c_name"
        ),
        F.lit(0.0).alias("c_acctbal"),
    )
    changes = updates.unionByName(deletes).unionByName(inserts)

    got = sorted(
        tuple(r) for r in merge_changes(jdbc_base, changes, "c_custkey").collect()
    )
    want = sorted(
        tuple(r) for r in QUERIES["q_cdc_merge_upsert"](spark, sf_dir).collect()
    )
    assert got == want and len(got) > 0
