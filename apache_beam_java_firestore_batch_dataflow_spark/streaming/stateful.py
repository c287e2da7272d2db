"""Custom stateful streaming operator via ``applyInPandasWithState``.

Built-in windowed aggregations (streaming/windows.py) cover time-bucketed
state; this module is the escape hatch for state machines Spark's
operators can't express — here, per-user lifetime running totals with an
inactivity timeout that emits a final "session summary" row and frees the
state.

Scale design: state lives in the state store, partitioned by the group
key — the same hash shuffle as a groupBy, so 10^9 users spread across
executors.  Each micro-batch touches only keys present in that batch
(plus timed-out keys).  The per-group pandas function receives Arrow
batches, never a driver-side collect.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, n_events long, sum_value double, final boolean"
)
STATE_SCHEMA = "n_events long, sum_value double"


def _make_update_fn(timeout_ms: int):
    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            n, total = state.get
            state.remove()
            yield pd.DataFrame(
                {"user_id": [user_id], "n_events": [n], "sum_value": [total],
                 "final": [True]}
            )
            return

        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, round(total, 6)))
        if timeout_ms > 0:
            # Idle users emit a final row and free their state once the
            # wall clock passes the timeout — the state-bounding knob.
            state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame(
            {"user_id": [user_id], "n_events": [n], "sum_value": [round(total, 6)],
             "final": [False]}
        )

    return update


def running_user_totals(events: DataFrame, timeout_ms: int = 30_000) -> DataFrame:
    """Streaming: cumulative (n_events, sum_value) per user, one updated
    row per user per micro-batch it appears in; a final=True row when the
    user times out (``timeout_ms <= 0`` disables the timeout — state then
    lives forever, only sane for bounded replays)."""
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if timeout_ms > 0
        else GroupStateTimeout.NoTimeout
    )
    return events.select("user_id", "value").groupBy("user_id").applyInPandasWithState(
        _make_update_fn(timeout_ms),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )
