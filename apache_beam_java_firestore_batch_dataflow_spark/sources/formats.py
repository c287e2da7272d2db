"""Generic file-format IO (parquet/orc/csv/json/text) with scale-sane
defaults.

The reference reads exactly one format — line text via ``TextIO.read()``
(NaiveImplementation.java:36) — and writes none.  A general engine needs
the full format matrix; Spark ships the readers, so this module's value
is the guard rails that matter at 100 TB:

* **No schema inference on text formats.** Inferring a csv/json schema
  scans the data once before the real job — doubling IO at scale.
  ``read_table`` therefore *requires* an explicit schema for csv/json
  unless ``allow_inference=True`` is passed deliberately.
* **Partitioned layout.** ``write_table(partition_by=...)`` produces
  hive-style directories; reads with a filter on the partition column
  prune whole directories (``PartitionFilters`` in the scan, verified in
  tests/test_formats.py).
* Self-describing columnar formats (parquet/orc) pass schema through and
  keep predicate pushdown + column pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

SELF_DESCRIBING = {"parquet", "orc"}
TEXTUAL = {"csv", "json"}
FORMATS = SELF_DESCRIBING | TEXTUAL | {"text"}


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str,
    schema: str | None = None,
    allow_inference: bool = False,
    **options: str,
) -> DataFrame:
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; expected one of {sorted(FORMATS)}")
    if fmt in TEXTUAL and schema is None and not allow_inference:
        raise ValueError(
            f"{fmt} read requires an explicit schema (inference scans the whole "
            "dataset first); pass allow_inference=True to override deliberately"
        )
    reader = spark.read.format(fmt)
    if fmt == "csv":
        reader = reader.option("header", options.pop("header", "true"))
    if schema is not None:
        reader = reader.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)


def write_table(
    df: DataFrame,
    path: str,
    fmt: str,
    mode: str = "error",
    partition_by: list[str] | None = None,
    **options: str,
) -> None:
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; expected one of {sorted(FORMATS)}")
    writer = df.write.format(fmt).mode(mode)
    if fmt == "csv":
        writer = writer.option("header", options.pop("header", "true"))
    for k, v in options.items():
        writer = writer.option(k, v)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)
