"""Custom stateful streaming operator: per-key session aggregation via
applyInPandasWithState.

The reference has no stateful operators (its only state is the
micro-batch buffer, destination.go:385-391); this is the engine-side
building block a training-data pipeline needs for interaction-log
sessionization over an unbounded stream: per-user state carries the
open session across micro-batches; closed sessions are emitted either
when a later event for the same user exceeds the inactivity gap, or
when the event-time WATERMARK passes the open session's gap deadline
(EventTimeTimeout).

Why event-time, not processing-time, timeouts: with
ProcessingTimeTimeout every batch re-registers a timeout, so
`shouldRunAnotherBatch` is permanently true and the query schedules
empty "cleaning up state" batches forever — `availableNow` never
terminates and `processAllAvailable` spins (the round-1 suite hang).
With EventTimeTimeout the extra batch only runs while the watermark
advances, which only happens on new data, so bounded triggers
terminate; it is also the correct semantics for log REPLAY, where
wall-clock time says nothing about session boundaries.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
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
    session; emit every session that closes (gap exceeded, or watermark
    passed the open session's deadline)."""
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
    ts = np.sort(pd.concat(list(pdfs))["ts_ms"].to_numpy(dtype=np.int64))
    if len(ts) == 0:
        if last is not None:
            state.update((start, last, n))
            _arm_timeout(state, last)
        return
    # vectorized segmentation: a session break is any gap > GAP_MS
    brk = np.flatnonzero(np.diff(ts) > GAP_MS) + 1
    seg_lo = np.concatenate(([0], brk))
    seg_hi = np.concatenate((brk, [len(ts)]))
    segs = [
        (int(ts[lo]), int(ts[hi - 1]), int(hi - lo))
        for lo, hi in zip(seg_lo, seg_hi)
    ]
    if last is not None:
        # a micro-batch may deliver events OLDER than the open session's
        # span (they're still inside the watermark), so the state segment
        # can land anywhere among the batch segments: merge by sorted
        # order and coalesce any adjacent pair within GAP, taking
        # min(start)/max(end) so an old event can never regress the
        # session end (and may bridge two batch segments through state).
        segs.append((start, last, n))
        segs.sort(key=lambda s: s[0])
        merged = [segs[0]]
        for s in segs[1:]:
            p = merged[-1]
            if s[0] - p[1] <= GAP_MS:
                merged[-1] = (p[0], max(p[1], s[1]), p[2] + s[2])
            else:
                merged.append(s)
        segs = merged
    closed = segs[:-1]
    start, last, n = segs[-1]
    state.update((start, last, n))
    _arm_timeout(state, last)
    if closed:
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(closed),
                "session_start_ms": [c[0] for c in closed],
                "session_end_ms": [c[1] for c in closed],
                "n_events": [c[2] for c in closed],
            }
        )


def _arm_timeout(state: GroupState, last_ms: int) -> None:
    """Close the open session once the watermark passes last + GAP.
    The timestamp must be strictly beyond the current watermark."""
    wm = state.getCurrentWatermarkMs()
    state.setTimeoutTimestamp(max(last_ms + GAP_MS + 1, wm + 1))


def sessionize_stream(events: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """events stream (user_id long, ts_ms long) -> closed sessions.

    Use on a readStream DataFrame; emits in append mode. State lives in
    the streaming state store, checkpointed with the query. The
    watermark bounds how late an event may arrive and still join its
    session; it also drives EventTimeTimeout session-close.
    """
    return (
        events.withColumn("ts", F.timestamp_millis(F.col("ts_ms")))
        .withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_fn,
            SESSION_OUTPUT,
            STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


def dedup_stream(
    events: DataFrame,
    id_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Streaming EXACT dedup: emit each key's first occurrence, keyed
    state expiring with the watermark (dropDuplicatesWithinWatermark) —
    the streaming twin of the batch exact_dedup operator. State is
    bounded by keys-per-watermark-window, not stream length, so it
    holds at unbounded-log scale where a plain dropDuplicates would
    grow state forever."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        id_cols
    )


FUNNEL_OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("converted_ms", T.LongType(), False),
    ]
)

FUNNEL_STATE = T.StructType(
    [
        T.StructField("step", T.IntegerType(), True),   # steps completed
        T.StructField("t", T.LongType(), True),          # ts of last completed
        T.StructField("done", T.IntegerType(), True),
        T.StructField("buf_ts", T.ArrayType(T.LongType()), True),
        T.StructField("buf_step", T.ArrayType(T.IntegerType()), True),
    ]
)


def _funnel_fn_factory(n_steps: int):
    """Per-user funnel state machine with WATERMARK-ORDERED processing:
    incoming events buffer until the event-time watermark passes them,
    then fold in event-time order — so cross-batch event reordering
    inside the watermark cannot produce a different verdict than the
    batch funnel (the CEP-engine discipline). Events above the final
    watermark stay buffered, exactly the boundary the oracle models."""

    def _fn(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        step, t, done, buf_ts, buf_step = (
            state.get if state.exists else (0, None, 0, [], [])
        )
        buf_ts = list(buf_ts or [])
        buf_step = list(buf_step or [])
        if not state.hasTimedOut:
            for pdf in pdfs:
                buf_ts.extend(int(x) for x in pdf["ts_ms"])
                buf_step.extend(int(x) for x in pdf["step_idx"])
        wm = state.getCurrentWatermarkMs()
        if done:
            state.update((step, t, 1, [], []))
            return
        # fold every buffered event at or below the watermark, in
        # event-time order (stable tiebreak on step index so an equal-ts
        # earlier step folds first — it still cannot advance a later
        # step at the same ts because progression is strictly-after)
        ripe = sorted(
            ((ts, s) for ts, s in zip(buf_ts, buf_step) if ts <= wm)
        )
        rest = [(ts, s) for ts, s in zip(buf_ts, buf_step) if ts > wm]
        for ts, s in ripe:
            if s == step and (step == 0 or ts > t):
                step += 1
                t = ts
                if step == n_steps:
                    done = 1
                    rest = []
                    break
        state.update(
            (step, t, done, [x for x, _ in rest], [s for _, s in rest])
        )
        if rest:
            # wake when the watermark can pass the oldest buffered event
            state.setTimeoutTimestamp(max(min(x for x, _ in rest) + 1, wm + 1))
        if done:
            yield pd.DataFrame({"user_id": [user_id], "converted_ms": [t]})

    return _fn


def funnel_stream(
    events: DataFrame,
    steps: list[str],
    watermark: str = "30 minutes",
    type_col: str = "event_type",
) -> DataFrame:
    """Streaming ordered funnel: emit (user_id, converted_ms) the
    moment a user completes every step of `steps` strictly in order
    (first-touch semantics, identical to functions.metrics.funnel).

    events: a readStream DataFrame with (user_id long, ts_ms long,
    event_type string). Non-step events are filtered before the
    shuffle; step names map to indices so state holds ints only.
    State per user is the step cursor plus a buffer of events still
    above the watermark — bounded by the user's event rate within one
    watermark window, not stream length; converted users keep a
    tombstone flag so re-entries never double-emit."""
    idx = F.lit(None).cast("int")
    for i, s in enumerate(steps):
        idx = F.when(F.col(type_col) == s, F.lit(i)).otherwise(idx)
    ev = (
        events.withColumn("step_idx", idx)
        .where(F.col("step_idx").isNotNull())
        .withColumn("ts", F.timestamp_millis(F.col("ts_ms")))
        .withWatermark("ts", watermark)
        .select("user_id", "ts", "ts_ms", "step_idx")
    )
    return ev.groupBy("user_id").applyInPandasWithState(
        _funnel_fn_factory(len(steps)),
        FUNNEL_OUTPUT,
        FUNNEL_STATE,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )
