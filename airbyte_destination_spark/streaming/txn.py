"""Transaction-boundary-atomic CDC apply.

A binlog/WAL tail arrives as change events grouped into SOURCE
TRANSACTIONS (Debezium's transaction metadata topic: each event carries
a `txn_id`; events of one transaction are contiguous in commit/LSN
order). The reference connector flushes on size bounds alone
(destination.go:29,435 — 500 records / 1,047,000 bytes), so a reader of
the destination table can observe HALF of a source transaction between
two flushes. This module restores the upstream database's transactional
read contract: epoch cuts are aligned to transaction boundaries, so
every committed snapshot of the lake table reflects a set of WHOLE
source transactions — never a partial one.

Why this matters at 10^10 events: consumers of the ingested table
(rollup maintenance, replication via `lake_changes`, SCD2 history) all
observe per-commit states. If a commit can split a transaction, every
derived pipeline inherits torn reads from the source database — a class
of bug that no amount of exactly-once machinery downstream can repair.

Design (batch-expressible, no driver-side greedy loop):

1. `txn_epoch_plan` summarizes the tail PER TRANSACTION (one row per
   txn: n_records, n_bytes, lsn range) and assigns each whole txn to an
   epoch with the same exclusive-prefix-sum rule the size-bounded
   micro-batcher uses (O7): epoch = max(floor(cum_records / R),
   floor(cum_bytes / B)) over txns in commit order. Both floors are
   monotone in txn order, so epochs are contiguous; a transaction is a
   single row of the plan, so it can never split. An epoch exceeds a
   cap by at most ONE transaction (the greedy flush-before-append rule,
   batch-expressible); a single transaction larger than a cap gets its
   own epoch rather than being torn.

   Scale shape: the plan is computed over TRANSACTION SUMMARIES, not
   events — one aggregated row per txn. The running sum is an
   unpartitioned window over that summary (a planner runs on the newly
   arrived TAIL each cycle, not on 10^10 historical events, so the
   window input is tail-sized); the event-level work — the groupBy and
   the epoch tag join — is fully distributed.

2. `stage_txn_epochs` tags events with their epoch in ONE distributed
   pass (shuffle join on txn_id — the plan is txn-count-sized, hinted
   broadcast only below a row threshold) and writes them out
   partitioned by epoch (`partitionBy` — one job, one file tree).

3. `apply_txn_log` replays the staged epoch directories through the
   normal exactly-once merge (`apply_change_batch`, epoch ids
   `<job>-<k>`): each epoch is one atomic snapshot commit, crash-resume
   skips applied epochs via the table's own epoch markers.

Reference frame: destination.go:384-470 buffers and flushes on size
alone; Debezium's `provides.transaction.metadata` is the public wire
contract for the txn_id column.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from airbyte_destination_spark.lake import LakeTable, MergeStats
from airbyte_destination_spark.streaming.pipeline import (
    IngestConfig,
    apply_change_batch,
    run_ingest_batches,
)

# below this many transactions the epoch-tag join broadcasts the plan;
# above it, a plain shuffle join on txn_id (a web-scale tail can carry
# 10^6+ transactions — never an unconditional broadcast)
_BROADCAST_PLAN_MAX = 100_000


def txn_epoch_plan(
    log: DataFrame,
    txn_col: str = "txn_id",
    order_col: str = "change_lsn",
    max_records: int = 500,
    max_bytes: int | None = None,
    bytes_expr=None,
) -> DataFrame:
    """Assign every source transaction to exactly one apply epoch.

    Returns one row per transaction: (txn_id, epoch_id, n_records,
    n_bytes, lsn_min, lsn_max). Epoch ids are dense (0..n-1) and
    ordered by the transactions' commit order (min order_col).

    The assignment rule is the O7 micro-batcher's exclusive prefix sum
    lifted from records to whole transactions: a txn whose cumulative
    predecessor total crosses a cap opens the next epoch, so no epoch
    exceeds a cap by more than one transaction and no transaction is
    ever split across epochs.
    """
    if max_bytes is not None and bytes_expr is None:
        raise ValueError("max_bytes requires bytes_expr (per-event byte estimate)")

    aggs = [
        F.count(F.lit(1)).alias("n_records"),
        F.min(order_col).alias("lsn_min"),
        F.max(order_col).alias("lsn_max"),
    ]
    if bytes_expr is not None:
        aggs.append(F.sum(bytes_expr).alias("n_bytes"))
    txns = log.groupBy(F.col(txn_col).alias("txn_id")).agg(*aggs)
    if bytes_expr is None:
        txns = txns.withColumn("n_bytes", F.lit(None).cast("long"))

    # running exclusive totals over txns in commit order. The window is
    # unpartitioned BY DESIGN — its input is the txn summary of the
    # planner's tail window, not the event stream (see module doc).
    w = Window.orderBy("lsn_min").rowsBetween(Window.unboundedPreceding, -1)
    cum_rec = F.coalesce(F.sum("n_records").over(w), F.lit(0))
    epoch = F.floor(cum_rec / max_records)
    if max_bytes is not None:
        cum_bytes = F.coalesce(F.sum("n_bytes").over(w), F.lit(0))
        epoch = F.greatest(epoch, F.floor(cum_bytes / max_bytes))
    planned = txns.withColumn("_raw_epoch", epoch)
    # densify: the max() of two floors can skip ordinals; epoch ids
    # number actual commits 0..n-1 (dense_rank over a second pass of
    # the same tiny window input)
    dense = F.dense_rank().over(Window.orderBy("_raw_epoch")) - 1
    return planned.select(
        "txn_id",
        dense.cast("long").alias("epoch_id"),
        "n_records",
        "n_bytes",
        "lsn_min",
        "lsn_max",
    )


def stage_txn_epochs(
    log: DataFrame,
    plan: DataFrame,
    out_dir: str,
    txn_col: str = "txn_id",
) -> list[str]:
    """Tag events with their planned epoch and stage them to disk
    partitioned by epoch — ONE distributed pass over the tail; the
    apply loop then reads immutable per-epoch directories in order.

    Returns the ordered list of epoch directory paths.
    """
    # materialize the plan once: its unpartitioned prefix-sum window
    # would otherwise run twice (the count here and again inside the
    # staging write's join); the plan is txn-count-sized (tail-scale)
    tag = plan.select(
        F.col("txn_id").alias("_plan_txn"), "epoch_id"
    ).localCheckpoint(eager=False)
    n_txns = tag.count()
    if n_txns <= _BROADCAST_PLAN_MAX:
        tag = F.broadcast(tag)
    tagged = (
        log.join(tag, log[txn_col] == tag["_plan_txn"], "inner")
        .drop("_plan_txn")
        .drop(txn_col)  # planning metadata — not a table column
    )
    tagged.write.mode("overwrite").partitionBy("epoch_id").parquet(out_dir)
    dirs = sorted(
        (d for d in os.listdir(out_dir) if d.startswith("epoch_id=")),
        key=lambda d: int(d.split("=", 1)[1]),
    )
    return [os.path.join(out_dir, d) for d in dirs]


def apply_txn_log(
    spark: SparkSession,
    log: DataFrame,
    table: LakeTable,
    cfg: IngestConfig | None = None,
    txn_col: str = "txn_id",
    max_records: int = 500,
    max_bytes: int | None = None,
    bytes_expr=None,
    stage_dir: str | None = None,
    job_name: str = "txn",
) -> list[MergeStats]:
    """Replay a transaction-tagged change tail with txn-atomic commits.

    Every snapshot the table commits reflects a prefix of WHOLE source
    transactions. Exactly-once and crash-resume are inherited from the
    epoch markers: epoch ids are deterministic (`<job>-<k>` in plan
    order), so a rerun skips epochs the table already absorbed.
    """
    import tempfile

    cfg = cfg or IngestConfig()
    plan = txn_epoch_plan(
        log,
        txn_col=txn_col,
        order_col=cfg.version_col,
        max_records=max_records,
        max_bytes=max_bytes,
        bytes_expr=bytes_expr,
    )
    stage = stage_dir or tempfile.mkdtemp(prefix="txn-stage-")
    epoch_dirs = stage_txn_epochs(log, plan, stage, txn_col=txn_col)
    return run_ingest_batches(spark, epoch_dirs, table, cfg, job_name=job_name)
