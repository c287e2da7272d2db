"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship reference-parity query (word count over
``documents.text``) at sf0.001.  ``queries()``/``oracle_sql()`` aggregate
the operator registries from the engine's modules; every entry with an
oracle is hash-compared against DuckDB at sf0.01 by the driver.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from apache_beam_java_firestore_batch_dataflow_spark.operators import (
    curation,
    dedup,
    multimodal,
    relational,
    similarity,
    skew,
    timeseries,
    tpch,
    udfs,
)
from apache_beam_java_firestore_batch_dataflow_spark.operators import text as text_ops
from apache_beam_java_firestore_batch_dataflow_spark.streaming import joins as stream_joins
from apache_beam_java_firestore_batch_dataflow_spark.streaming import windows as stream_windows

_MODULES = [
    relational,
    tpch,
    text_ops,
    dedup,
    similarity,
    multimodal,
    stream_windows,
    stream_joins,
    timeseries,
    skew,
    udfs,
    curation,
]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's word count, run over documents.text."""
    return text_ops.q_wordcount_documents(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _MODULES:
        out.update(mod.QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _MODULES:
        out.update(mod.ORACLES)
    return out
