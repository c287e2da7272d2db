"""Timestamp-type-agnostic epoch arithmetic.

The driver's parquet fixtures have shipped ``ts``/date columns as
TIMESTAMP(NANOS)-as-long, TIMESTAMP (LTZ), and TIMESTAMP_NTZ across
regenerations.  Most Spark time functions accept every flavor, but
``unix_micros`` requires TIMESTAMP (LTZ) and raises
``DATATYPE_MISMATCH.UNEXPECTED_INPUT_TYPE`` on TIMESTAMP_NTZ.  With the
session timezone pinned to UTC (tables.py), an NTZ -> LTZ cast is a pure
wall-clock reinterpretation, so ``epoch_us`` below equals DuckDB's
``epoch_us(naive_ts)`` exactly for either input type — and, being a
cast + builtin, stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ColumnOrName = "Column | str"


def epoch_us(col: Column | str) -> Column:
    """Microseconds since the epoch of the UTC wall-clock reading.

    Accepts TIMESTAMP or TIMESTAMP_NTZ (column or name); the cast is a
    no-op for LTZ input under a UTC session timezone.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))
