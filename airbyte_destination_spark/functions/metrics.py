"""Product-analytics metrics over the event stream.

The reference connector feeds a hosted analytics API whose headline
read-side products are funnels, retention cohorts, and zero-filled
time-series counters (the reference delegates these to its warehouse;
see README "Propel" framing — the ingest side is `destination.go`).
This module re-expresses those three read-side metric shapes as
native DataFrame plans over the same events table the engine ingests,
so a user of the hosted product can run the equivalent metric straight
on the lake table.

Scale notes (the part that matters at 10^10 events):

- ``funnel`` is k-1 chained min-aggregate joins, all keyed on the
  entity id: each stage's state is ONE row per user still in the
  funnel (ids + one timestamp), never the event payload, and each
  stage strictly shrinks. No per-user event arrays are ever
  collected (`collect_list` per user is the classic funnel OOM at
  10^9-event users); no window over the raw stream.
- ``retention`` reuses one user-keyed shuffle for both the cohort
  assignment (min day) and the activity set (distinct user-day), then
  aggregates a grid that is at most |cohorts| x |offsets| rows.
- ``timeseries_fill`` aggregates first (bucket-sized result), then
  LEFT-joins a `sequence()`-generated bucket grid — the grid is
  span-sized, generated distributed from a 1-row bounds aggregate,
  never a driver loop.

All outputs use epoch-ms bucket keys and 6dp-rounded rates so the
DuckDB oracle replays them bit-for-bit (idiom shared with
rollup_daily / lm_perplexity).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_DAY_MS = 86_400_000


def funnel(
    df: DataFrame,
    steps: Sequence[str],
    id_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered-funnel conversion: how many entities performed
    ``steps[0]``, then ``steps[1]`` STRICTLY AFTER it, and so on.

    Semantics: an entity reaches step i+1 iff it has an event of that
    type with timestamp strictly greater than the EARLIEST time it
    reached step i (the standard first-touch funnel; re-entry windows
    are a threshold on the same join). Returns one row per step:
    (step_idx, step, n_users, conv_pct) with conv_pct relative to
    step 1, rounded to 6dp.

    Plan: stage i is `filter(type=step_i) join reached_{i-1} on id,
    where ts > t, groupBy id agg min(ts)` — the join carries only
    (id, t) on the small side and each stage's output shrinks
    monotonically. The final k-row union is aggregated with a k-row
    window (k = len(steps), a constant).
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    base = df.select(
        F.col(id_col).alias("_fid"), F.col(type_col).alias("_ft"), F.col(ts_col).alias("_fts")
    )
    reached: DataFrame | None = None
    per_step: list[DataFrame] = []
    for i, step in enumerate(steps):
        ev = base.where(F.col("_ft") == step)
        if reached is None:
            cur = ev.groupBy("_fid").agg(F.min("_fts").alias("_t"))
        else:
            cur = (
                ev.join(reached, "_fid")
                .where(F.col("_fts") > F.col("_t"))
                .groupBy("_fid")
                .agg(F.min("_fts").alias("_t"))
            )
        reached = cur
        per_step.append(
            cur.agg(F.count(F.lit(1)).alias("n_users")).select(
                F.lit(i + 1).alias("step_idx"),
                F.lit(step).alias("step"),
                F.col("n_users").cast("long").alias("n_users"),
            )
        )
    out = per_step[0]
    for p in per_step[1:]:
        out = out.unionByName(p)
    # k rows total: the ordered window over them is not a scale concern
    w = Window.orderBy("step_idx").rowsBetween(Window.unboundedPreceding, 0)
    return out.withColumn(
        "conv_pct",
        F.round(F.col("n_users") / F.first("n_users").over(w), 6),
    )


def retention(
    df: DataFrame,
    id_col: str = "user_id",
    ts_col: str = "ts",
    max_offset_days: int = 14,
) -> DataFrame:
    """Cohort retention: users are cohorted by the DAY of their first
    event; for each (cohort_day, day_offset<=max) report how many of
    the cohort were active that day and the retention rate.

    Returns (cohort_day_ms, day_offset, n_active, cohort_n,
    retention_pct) — offset 0 is the cohort day itself, so
    retention_pct(0) == 1.0 by construction (a cheap invariant check).

    Plan: one user-keyed aggregate for cohort day, one distinct over
    (user, day) for the activity set, an id-keyed join between the
    two (both sides are per-user/per-user-day reductions of the scan,
    not raw events), and a grid-sized final aggregate.
    """
    day_ms = (F.unix_millis(F.col(ts_col).cast("timestamp")) / _DAY_MS).cast(
        "long"
    ) * _DAY_MS
    ud = df.select(F.col(id_col).alias("_rid"), day_ms.alias("_day")).distinct()
    first = ud.groupBy("_rid").agg(F.min("_day").alias("_cohort"))
    cohort_n = first.groupBy("_cohort").agg(
        F.count(F.lit(1)).cast("long").alias("cohort_n")
    )
    grid = (
        ud.join(first, "_rid")
        .withColumn(
            "day_offset",
            ((F.col("_day") - F.col("_cohort")) / _DAY_MS).cast("int"),
        )
        .where(F.col("day_offset") <= max_offset_days)
        .groupBy("_cohort", "day_offset")
        .agg(F.count(F.lit(1)).cast("long").alias("n_active"))
    )
    return (
        grid.join(cohort_n, "_cohort")
        .select(
            F.col("_cohort").alias("cohort_day_ms"),
            "day_offset",
            "n_active",
            "cohort_n",
            F.round(F.col("n_active") / F.col("cohort_n"), 6).alias(
                "retention_pct"
            ),
        )
    )


def timeseries_fill(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    where=None,
) -> DataFrame:
    """Zero-filled daily time series of (count, sum(value)): every day
    between the first and last observed event appears, empty buckets
    as explicit zeros — the gap-fill contract of a hosted time-series
    metric endpoint (a chart cannot interpolate over missing rows).

    Returns (day_ms, n_events, total) with total rounded to 4dp.

    Plan: the scan aggregates to bucket rows first; the day grid is
    `sequence(min, max, step)` exploded from the 1-row bounds
    aggregate of THAT bucket table (span-sized, distributed), then a
    LEFT join back. At web scale the joined sides are |days| rows —
    the raw stream is touched exactly once.
    """
    base = df if where is None else df.where(where)
    day_ms = (F.unix_millis(F.col(ts_col).cast("timestamp")) / _DAY_MS).cast(
        "long"
    ) * _DAY_MS
    agg = base.groupBy(day_ms.alias("day_ms")).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.round(F.sum(value_col), 4).alias("total"),
    )
    grid = (
        agg.agg(F.min("day_ms").alias("lo"), F.max("day_ms").alias("hi"))
        .select(
            F.explode(
                F.sequence("lo", "hi", F.lit(_DAY_MS).cast("long"))
            ).alias("day_ms")
        )
    )
    return grid.join(agg, "day_ms", "left").select(
        "day_ms",
        F.coalesce("n_events", F.lit(0).cast("long")).alias("n_events"),
        F.coalesce("total", F.lit(0.0)).alias("total"),
    )


def leaderboard(
    df: DataFrame,
    dim_col: str = "user_id",
    value_col: str = "value",
    k: int = 10,
    where=None,
) -> DataFrame:
    """Leaderboard metric: top-k dimension values by sum(value), with
    rank. Returns (rank, dim, n_events, total) — total 4dp-rounded,
    ties ranked by (total desc, dim asc) so results are reproducible.

    Plan: one map-side-combined aggregate on the dimension, then
    DISTRIBUTED top-k — `orderBy().limit(k)` plans as
    TakeOrderedAndProject (each partition keeps its own k, the driver
    merges k*partitions rows), never a single-partition sort of the
    full dimension table; the rank window runs over k rows.
    """
    base = df if where is None else df.where(where)
    agg = base.groupBy(F.col(dim_col).alias("dim")).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.round(F.sum(value_col), 4).alias("total"),
    )
    top = agg.orderBy(F.col("total").desc(), F.col("dim").asc()).limit(k)
    w = Window.orderBy(F.col("total").desc(), F.col("dim").asc())
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank", F.col("dim").alias(dim_col), "n_events", "total"
    )


def counter_compare(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    window_days: int = 7,
    where=None,
) -> DataFrame:
    """Counter metric with a previous-period comparison: sum(value) and
    event count over the LAST `window_days` days of the stream vs the
    `window_days` immediately before, plus the relative delta — the
    "this week vs last week" tile of a hosted counter endpoint.

    The current window is (max_day - window, max_day] in whole days,
    anchored on the data's own max day so the metric is deterministic
    for a replayed log. Returns ONE row: (cur_n, cur_total, prev_n,
    prev_total, delta_pct) — delta NULL when the previous period is
    empty (a 0-division is a dashboard lie). Two scan-fused conditional
    aggregates; no join, no shuffle beyond the single global aggregate.
    """
    base = df if where is None else df.where(where)
    day_ms = (F.unix_millis(F.col(ts_col).cast("timestamp")) / _DAY_MS).cast(
        "long"
    ) * _DAY_MS
    span = window_days * _DAY_MS
    withd = base.select(day_ms.alias("d"), F.col(value_col).alias("v"))
    mx = withd.agg(F.max("d").alias("mx"))
    j = withd.crossJoin(F.broadcast(mx))
    cur = F.col("d") > F.col("mx") - span
    prev = (F.col("d") <= F.col("mx") - span) & (
        F.col("d") > F.col("mx") - 2 * span
    )
    out = j.agg(
        F.sum(cur.cast("long")).alias("cur_n"),
        F.round(F.sum(F.when(cur, F.col("v")).otherwise(0.0)), 4).alias(
            "cur_total"
        ),
        F.sum(prev.cast("long")).alias("prev_n"),
        F.round(F.sum(F.when(prev, F.col("v")).otherwise(0.0)), 4).alias(
            "prev_total"
        ),
    )
    return out.select(
        "cur_n",
        "cur_total",
        "prev_n",
        "prev_total",
        F.when(
            F.col("prev_total") != 0,
            F.round(
                (F.col("cur_total") - F.col("prev_total"))
                / F.col("prev_total"),
                6,
            ),
        ).alias("delta_pct"),
    )


def cube_rollup(
    df: DataFrame,
    dim_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Multi-dimensional rollup: one pass producing every grouping set
    of (dimension, day) — per-cell, per-dimension, per-day, and grand
    totals (the warehouse CUBE the reference delegates to ClickHouse's
    grouping sets; SURVEY §2 lists grouping sets among the
    out-of-repo relational ops).

    Physical shape: Catalyst's `Expand` replicates each input row once
    per grouping set BEFORE the one hash aggregate, and the aggregate
    is map-side partially combined — so the shuffle carries at most
    4 × |distinct cells| rows, not 4 × |events|. At 10^10 events the
    cost is one scan + one 4-way-expanded partial agg; no second pass
    per grouping set (the naive UNION ALL of four GROUP BYs scans the
    table four times).

    Aggregated-out dimensions surface as NULL (the SQL convention, and
    the dimension itself is never NULL in the event stream, so NULL is
    unambiguous here). Totals round to 4 dp for cross-engine equality.
    """
    day_ms = (F.unix_millis(F.col(ts_col).cast("timestamp")) / _DAY_MS).cast(
        "long"
    ) * _DAY_MS
    base = df.select(F.col(dim_col).alias("dim"), day_ms.alias("day_ms"),
                     F.col(value_col).alias("v"))
    return base.cube("dim", "day_ms").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("v"), 4).alias("total"),
    )


def pivot_daily(
    df: DataFrame,
    dims: Sequence[str] = ("view", "click", "purchase", "signup", "error"),
    dim_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Daily counts pivoted to one column per dimension value — the
    wide export shape dashboards ask of an events table.

    The pivot value list is EXPLICIT (and becomes the output schema):
    an undeclared list means a dimension-discovery job (a distinct
    collect a 10^9-value dimension turns into a driver OOM). The
    columns compile directly to `count(CASE WHEN dim = v)` conditional
    aggregates — ONE day-keyed exchange with map-side combine,
    whole-stage codegen'd; the builtin `RelationalGroupedDataset.pivot`
    plans TWO aggregates (pre-agg per (key, value) then PivotFirst),
    i.e. a second exchange this shape doesn't need.
    """
    day_ms = (F.unix_millis(F.col(ts_col).cast("timestamp")) / _DAY_MS).cast(
        "long"
    ) * _DAY_MS
    base = df.select(day_ms.alias("day_ms"), F.col(dim_col).alias("dim"))
    return base.groupBy("day_ms").agg(
        *[
            F.count(F.when(F.col("dim") == v, F.lit(1))).alias(v)
            for v in dims
        ]
    )


def user_growth(
    df: DataFrame, id_col: str = "user_id", ts_col: str = "ts"
) -> DataFrame:
    """Growth metrics per day: active users (DAU), first-seen users,
    and the cumulative distinct-user count.

    One (user, day) distinct and one user-keyed min-aggregate carry
    all the heavy lifting — both map-side combined, both shuffling at
    most |users| rows. The running cumulative sum is a window WITHOUT
    a partition key, which is only acceptable because its input is the
    per-day aggregate (|days| rows, bucket-sized) — never run an
    unpartitioned window over the raw stream. Exact distinct by
    construction (the distinct IS the shuffle), not HLL.
    """
    day_ms = (F.unix_millis(F.col(ts_col).cast("timestamp")) / _DAY_MS).cast(
        "long"
    ) * _DAY_MS
    ud = df.select(F.col(id_col).alias("_id"), day_ms.alias("day_ms")).distinct()
    dau = ud.groupBy("day_ms").agg(F.count(F.lit(1)).alias("dau"))
    first = ud.groupBy("_id").agg(F.min("day_ms").alias("day_ms"))
    new = first.groupBy("day_ms").agg(F.count(F.lit(1)).alias("new_users"))
    j = dau.join(new, "day_ms", "left").na.fill(0, ["new_users"])
    w = Window.orderBy("day_ms").rowsBetween(Window.unboundedPreceding, 0)
    return j.select(
        "day_ms", "dau", "new_users", F.sum("new_users").over(w).alias("cum_users")
    )
