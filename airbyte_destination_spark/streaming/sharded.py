"""Sharded change-log ingestion — the Kafka-partition / binlog-shard shape.

The reference consumes ONE ordered stream, one record at a time
(destination.go:393-400): a global total order exists because a single
process reads a single stdin. At 10^10 events there is no such log —
the tail arrives as K independently-ordered SHARDS (Kafka topic
partitions, Debezium tasks, sharded binlog servers): each shard is
internally ordered by a dense per-shard offset, keys are sticky to
shards (producer partitions by hash(key)), so per-KEY order is
preserved even though no cross-shard order exists. That per-key order
is the only order LWW-by-version needs.

This module re-expresses Structured Streaming's Kafka-source offset
accounting on the lake's OWN commit log:

- consumption is windowed per shard: shard i's offset range
  [w*window, (w+1)*window) is chunk `s<i>-<w>` — a deterministic,
  offset-addressed epoch id, so the consumed position is DERIVABLE from
  the table's epoch watermarks and no external checkpoint exists;
- one micro-batch (one merge, ONE shuffle) covers EVERY shard's next
  window — the per-shard frontier advances ATOMICALLY with the data
  because the chunk epoch ids ride the same manifest swap
  (LakeTable.merge accepts a list of epoch ids);
- resume is stateless: a restarted consumer reads the frontier back out
  of `epoch_watermarks` (prefix `s<i>` folds to a high-water mark) and
  continues; replaying an already-committed cycle skips idempotently.

Scale shape: the per-cycle scan is ONE parquet read with shard-
partition pruning (hive `shard=` layout) plus an offset range per
shard (row-group pruning — producers write offset-sorted files), so a
cycle touches only the frontier windows regardless of log size. The
merge itself is the engine's standard one-exchange apply. K only
widens the scan's OR predicate and the epoch-id list — both O(K)
metadata, no extra Spark jobs.

Tail-window contract: a window is committed when FULL, or when
`final=True` (availableNow-style drain) marks the log complete. After
a final drain the partial tail window's id is consumed; appending more
events to a drained log requires a new consumer prefix — the same rule
the backfill campaign documents (epoch ids derive from the prefix).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from airbyte_destination_spark.lake import LakeTable

from .pipeline import IngestConfig, apply_change_batch


def shard_change_log(
    spark: SparkSession,
    log: DataFrame,
    out_root: str,
    n_shards: int,
    key_col: str = "doc_id",
    order_col: str = "change_lsn",
) -> None:
    """Split a globally-ordered change log into K producer shards:
    shard = pmod(hash(key), K) (sticky keys — per-key order survives),
    offset = dense 0-based rank of `order_col` within the shard (the
    Kafka log-offset analog). Test/bench helper: in production the
    shards ARE the broker's partitions; this reproduces their layout
    deterministically from the synthetic global log.

    One job: a single hash exchange on shard (the rank window reuses
    it), offset-sorted files under hive `shard=<i>/` dirs so the
    consumer's offset-range scan prunes row groups.
    """
    from pyspark.sql import Window

    sharded = log.withColumn(
        "shard", F.pmod(F.hash(F.col(key_col)), F.lit(n_shards)).cast("int")
    )
    win = Window.partitionBy("shard").orderBy(F.col(order_col), F.col(key_col))
    (
        sharded.withColumn("offset", F.row_number().over(win) - F.lit(1))
        .repartition(n_shards, "shard")
        .sortWithinPartitions("offset")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(out_root)
    )


def shard_frontier(table: LakeTable, n_shards: int) -> list[int]:
    """Next unconsumed window index per shard, read straight off the
    table's epoch watermarks (prefix `s<i>` folds contiguously — one
    manifest read, no data scan). A table with no snapshots starts at
    window 0 everywhere."""
    if not table.exists():
        return [0] * n_shards
    wms = table.manifest().get("epoch_watermarks", {})
    applied = table.manifest().get("applied_epochs", {})

    def nxt(i: int) -> int:
        w = wms.get(f"s{i}", -1)
        # out-of-order tail (another grouping's ids not yet folded)
        while f"s{i}-{w + 1}" in applied:
            w += 1
        return w + 1

    return [nxt(i) for i in range(n_shards)]


@dataclass
class ShardedIngestStats:
    cycles: int = 0
    rows_applied: int = 0
    epochs: list[str] = field(default_factory=list)
    frontier: list[int] = field(default_factory=list)
    drained: bool = False


def run_ingest_sharded(
    table: LakeTable,
    spark: SparkSession,
    shard_root: str,
    n_shards: int,
    cfg: IngestConfig | None = None,
    window: int = 100_000,
    max_cycles: int | None = None,
    final: bool = True,
    metrics: LakeTable | None = None,
) -> ShardedIngestStats:
    """Consume a sharded change log to exhaustion (or `max_cycles`).

    Per cycle: read every shard's next offset window in ONE pruned scan,
    apply them as ONE merge batch whose epoch-id list `[s<i>-<w>, ...]`
    commits atomically with the data. Cross-shard version ties resolve
    exactly like any other in-batch tie (version column, then
    tiebreaks) — keys never span shards, so this only matters for logs
    whose producer violated stickiness.

    `final=False` (live-tail mode) commits only FULL windows: a partial
    tail window is left unconsumed and re-polled next cycle, so a
    producer may still be appending to it. `final=True` (the
    availableNow drain) consumes partial tails too.

    Returns ShardedIngestStats; `drained` is True when every shard's
    frontier passed its last offset (always reached with final=True
    unless max_cycles stops earlier; a live tail with a partial window
    never drains by construction).
    """
    cfg = cfg or IngestConfig()
    src = spark.read.parquet(shard_root)
    # end offsets, once per run — the "broker metadata" question. One
    # column-pruned scan; at a real broker this is an offsets API call.
    ends = {
        int(r["shard"]): int(r["end"])
        for r in src.groupBy("shard").agg(F.max("offset").alias("end")).collect()
    }
    stats = ShardedIngestStats()
    while max_cycles is None or stats.cycles < max_cycles:
        frontier = shard_frontier(table, n_shards)
        conds, epoch_ids = [], []
        for i in range(n_shards):
            lo = frontier[i] * window
            hi = lo + window
            end = ends.get(i, -1)
            if lo > end:
                continue  # drained shard
            if hi - 1 > end and not final:
                continue  # partial tail window; live tail re-polls it
            conds.append(
                (F.col("shard") == i)
                & (F.col("offset") >= lo)
                & (F.col("offset") < hi)
            )
            epoch_ids.append(f"s{i}-{frontier[i]}")
        if not conds:
            break
        cond = conds[0]
        for c in conds[1:]:
            cond = cond | c
        batch = src.where(cond).drop("shard", "offset")
        st = apply_change_batch(table, batch, epoch_ids, cfg)
        if metrics is not None:
            from .pipeline import _emit_metrics

            _emit_metrics(spark, metrics, st, table)
        stats.cycles += 1
        stats.rows_applied += st.rows_upserted
        stats.epochs.extend(epoch_ids)
    stats.frontier = shard_frontier(table, n_shards)
    stats.drained = all(
        stats.frontier[i] * window > ends.get(i, -1) for i in range(n_shards)
    )
    return stats
