"""Streaming Firestore sink: ``foreachBatch`` reusing the batch writer.

The reference's bundle-buffered sink (FirestoreUpdateDoFn.java:17-103)
maps to a Spark partition in batch mode (sinks/firestore.py) and to a
micro-batch here: each trigger's delta DataFrame is written through the
same chunked, client-per-partition, <=500-writes-per-commit path.

With ``outputMode("update")`` an aggregation emits only rows whose value
changed that micro-batch; because Firestore writes are idempotent upserts
keyed by doc id, replaying a micro-batch after failure converges to the
same state — the reference's at-least-once + idempotent contract
(SURVEY.md §2) carries over unchanged.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql.streaming import DataStreamWriter

from ..sinks.firestore import FirestoreSinkConfig, write_word_counts_batch


def stream_word_counts_writer(
    word_counts: DataFrame,
    config: FirestoreSinkConfig,
    client_factory: Callable[[], object],
    checkpoint_dir: str,
) -> DataStreamWriter:
    """Build (don't start) a foreachBatch writer for a streaming word count."""

    def handle_batch(batch_df: DataFrame, batch_id: int) -> None:
        write_word_counts_batch(batch_df, config, client_factory)

    return (
        word_counts.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(handle_batch)
    )
