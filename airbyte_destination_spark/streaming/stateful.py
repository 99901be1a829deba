"""Custom stateful streaming operator: per-key session aggregation via
applyInPandasWithState.

The reference has no stateful operators (its only state is the
micro-batch buffer, destination.go:385-391); this is the engine-side
building block a training-data pipeline needs for interaction-log
sessionization over an unbounded stream: per-user state carries the
open session across micro-batches, closed sessions are emitted when the
inactivity gap passes (processing-time timeout closes stragglers).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("session_start_ms", T.LongType(), False),
        T.StructField("session_end_ms", T.LongType(), False),
        T.StructField("n_events", T.LongType(), False),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_ms", T.LongType(), True),
        T.StructField("last_ms", T.LongType(), True),
        T.StructField("n", T.LongType(), True),
    ]
)

GAP_MS = 30 * 60 * 1000


def _sessionize_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold this micro-batch's events for one user into the open
    session; emit every session that closes (gap exceeded)."""
    (user_id,) = key
    if state.hasTimedOut:
        if state.exists:
            start, last, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start_ms": [start],
                    "session_end_ms": [last],
                    "n_events": [n],
                }
            )
        return

    start, last, n = state.get if state.exists else (None, None, 0)
    closed: list[tuple[int, int, int]] = []
    ts = (
        pd.concat(list(pdfs))["ts_ms"].sort_values().to_numpy()
    )
    for t in ts:
        t = int(t)
        if last is None:
            start, last, n = t, t, 1
        elif t - last > GAP_MS:
            closed.append((start, last, n))
            start, last, n = t, t, 1
        else:
            last, n = t, n + 1
    state.update((start, last, n))
    state.setTimeoutDuration(GAP_MS)
    if closed:
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(closed),
                "session_start_ms": [c[0] for c in closed],
                "session_end_ms": [c[1] for c in closed],
                "n_events": [c[2] for c in closed],
            }
        )


def sessionize_stream(events: DataFrame) -> DataFrame:
    """events stream (user_id long, ts_ms long) -> closed sessions.

    Use on a readStream DataFrame; emits in append mode. State lives in
    the streaming state store, checkpointed with the query.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _sessionize_fn,
        SESSION_OUTPUT,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.ProcessingTimeTimeout,
    )
