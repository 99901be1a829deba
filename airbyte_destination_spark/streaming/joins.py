"""Watermarked stream-stream interval join.

The reference's pipeline is a destination only — correlation between
event streams happens in its hosted warehouse. The native Structured
Streaming counterpart is the stream-stream join with event-time range
bounds: both sides are watermarked, the join condition carries an
explicit time interval, and the state store evicts rows once the
watermark proves no future match can arrive.

Scale shape: both sides shuffle ONCE on the join key into the same
state-store partitioning; per-partition state is bounded by
(watermark delay + interval width) × that key-partition's arrival
rate — NOT stream length — which is exactly the bound Spark needs to
run this join unbounded. Without the time-range condition Spark
(rightly) refuses inner stream-stream joins in append mode: state
would never be evictable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def interval_join_stream(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    lookback_ms: int,
    watermark: str = "1 hour",
) -> DataFrame:
    """Inner-join streaming `right` rows to streaming `left` rows of the
    same `key` whose `left_ts` falls in ``[right_ts - lookback_ms,
    right_ts)`` — "every view within the N hours before a purchase".

    `left_ts` / `right_ts` are epoch-ms long columns (the engine's
    native event-time shape); watermarks attach to derived timestamp
    columns on both sides, as Spark requires for state cleanup of BOTH
    join buffers. Output carries the key and both epoch-ms timestamps.
    """
    l = (
        left.select(
            F.col(key).alias("k"),
            F.col(left_ts).alias("l_ms"),
            F.timestamp_millis(F.col(left_ts)).alias("l_ts"),
        )
        .withWatermark("l_ts", watermark)
    )
    r = (
        right.select(
            F.col(key).alias("r_k"),
            F.col(right_ts).alias("r_ms"),
            F.timestamp_millis(F.col(right_ts)).alias("r_ts"),
        )
        .withWatermark("r_ts", watermark)
    )
    cond = (
        (l["k"] == r["r_k"])
        & (l["l_ts"] >= r["r_ts"] - F.expr(f"INTERVAL {lookback_ms} MILLISECONDS"))
        & (l["l_ts"] < r["r_ts"])
    )
    return l.join(r, cond, "inner").select(
        F.col("k").alias(key),
        F.col("l_ms").alias(left_ts),
        F.col("r_ms").alias(right_ts),
    )
