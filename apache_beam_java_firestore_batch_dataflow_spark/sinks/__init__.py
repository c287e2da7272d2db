"""Sink connectors (generic ``foreachPartition`` pattern)."""

from .firestore import (
    FirestoreSinkConfig,
    FakeFirestoreClient,
    fake_client_factory,
    read_fake_firestore_state,
    write_word_counts_batch,
    write_word_counts_naive,
)

__all__ = [
    "FirestoreSinkConfig",
    "FakeFirestoreClient",
    "fake_client_factory",
    "read_fake_firestore_state",
    "write_word_counts_batch",
    "write_word_counts_naive",
]
