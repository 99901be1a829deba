"""Chunked incremental-snapshot bootstrap (DBLog / Debezium incremental
snapshot) — stand up a lake table from a source whose change log no
longer reaches back to the beginning of history.

The problem: the reference connector's answer to "the log doesn't go
back far enough" is a full-refresh overwrite (destination.go overwrite
mode — rewrite everything, serve nothing meanwhile). The production CDC
answer (Netflix's DBLog watermark algorithm, adopted by Debezium as the
"incremental snapshot") is to read the source table in KEY-RANGE CHUNKS
interleaved with live log consumption, so the table becomes consistent
chunk by chunk without ever pausing the stream or rewriting the sink.

DBLog needs a watermark-window dedup step: its sink is unversioned, so
a chunk row landing AFTER a concurrent log event would physically
overwrite the newer value, and chunk rows observed inside the
(low-watermark, high-watermark) log window must be discarded. This
engine's sink is a version-ordered LWW merge (lake/table.py: max_by
change_lsn with delete tombstones), which makes the interleave
COMMUTATIVE — applying {chunk image as-of w} and {any log events} in
any order converges to the same state, because:

  * a chunk row carries its key's true stored lsn (<= w), so it ties
    with (byte-identical payload) or loses to any log event the stream
    also delivers, and wins over nothing newer;
  * a key deleted before the retention horizon is simply absent from
    every chunk image, and stays absent (no event resurrects it, since
    any surviving log event for it is newer than the delete by the
    horizon's definition);
  * a key whose whole history was trimmed away is recovered solely
    from its chunk image, stamped with its true last lsn.

So the window dedup is subsumed by the merge itself; the chunks exist
for bounded memory/staleness, not for correctness. Each chunk and each
log range commits as its own epoch, so a crashed bootstrap resumes
exactly where it stopped (replayed epochs no-op via the epoch marker)
— the same exactly-once contract as the streaming path.

Scale shape: one chunk = one groupBy over an lsn- and key-filtered
scan (or, in production, one bounded SELECT against the source) and
one O(chunk) merge. Nothing is ever O(full table) on the write path,
and the live stream keeps flowing between chunks.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..lake import LakeTable, MergeStats
from .pipeline import IngestConfig, apply_change_batch

ChunkReader = Callable[[int, int, int], DataFrame]


def chunk_predicate(key_col: str, chunk_id: int, n_chunks: int):
    """Hash-range membership for chunk `chunk_id` of `n_chunks`.

    xxhash64-mod rather than key ranges: a power-law key space (hot low
    doc ids, see sources/changegen.py) would make range chunks wildly
    uneven; the hash spreads every chunk across the full key
    distribution, so chunk cost is uniform by construction.
    """
    return F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_chunks)) == F.lit(chunk_id)


def log_prefix_chunk_reader(
    history: DataFrame,
    key_col: str = "doc_key",
    lsn_col: str = "change_lsn",
    op_col: str = "op",
) -> ChunkReader:
    """ChunkReader over a replayable full-history change log.

    Stands in for the production source-table SELECT (JDBC `WHERE
    hash(key) % n = i` against the upstream database): the chunk image
    as-of watermark w is the LWW state of the chunk's keys over events
    with lsn <= w — one key-partitioned max_by aggregation (map-side
    combine, single shuffle), deletes dropped, each surviving row
    stamped with its key's true last lsn and op 'r' (Debezium's
    snapshot-read op).
    """
    payload = [c for c in history.columns if c not in (key_col, lsn_col, op_col)]

    def reader(chunk_id: int, n_chunks: int, watermark: int) -> DataFrame:
        return (
            history.where(F.col(lsn_col) <= F.lit(watermark))
            .where(chunk_predicate(key_col, chunk_id, n_chunks))
            .groupBy(key_col)
            .agg(
                F.max(lsn_col).alias(lsn_col),
                F.max_by(F.struct(op_col, *payload), F.col(lsn_col)).alias("_w"),
            )
            .where(F.col(f"_w.{op_col}") != "D")
            .select(
                key_col,
                lsn_col,
                *[F.col(f"_w.{c}").alias(c) for c in payload],
                F.lit("r").alias(op_col),
            )
        )

    return reader


def bootstrap_ingest(
    table: LakeTable,
    live_log: DataFrame,
    chunk_reader: ChunkReader,
    cfg: IngestConfig | None = None,
    n_chunks: int = 4,
    epoch_prefix: str = "bootstrap",
    lsn_bounds: tuple[int, int] | None = None,
) -> list[MergeStats]:
    """Interleave live-log range applies with chunked snapshot reads.

    The live log (everything retention still holds, lsn in [lo, hi]) is
    split into n_chunks+1 contiguous lsn ranges; after range i lands,
    chunk i is read AS-OF that range's upper lsn w_i and applied — the
    DBLog cadence: the stream is never paused longer than one chunk,
    and each chunk's watermark is exactly the log position already
    applied. Correctness does not depend on this order (see module
    docstring); the cadence bounds how stale the chunk read may be.

    Every range and chunk commits under a deterministic epoch id
    (`{prefix}-log-{i}` / `{prefix}-chunk-{i}`), so re-running after a
    crash skips completed work and finishes the rest.
    """
    cfg = cfg or IngestConfig()
    lsn = cfg.version_col
    if lsn_bounds is None:
        lo, hi = live_log.select(F.min(lsn), F.max(lsn)).first()
        if lo is None:
            raise ValueError(
                "live_log is empty and no lsn_bounds were given; pass the "
                "source's current position so chunk watermarks are defined"
            )
    else:
        lo, hi = lsn_bounds
    step = max((hi - lo) // (n_chunks + 1) + 1, 1)
    stats: list[MergeStats] = []
    for i in range(n_chunks + 1):
        r_lo = lo + i * step
        r_hi = min(lo + (i + 1) * step, hi + 1)
        if r_lo < r_hi:
            batch = live_log.where((F.col(lsn) >= r_lo) & (F.col(lsn) < r_hi))
            stats.append(
                apply_change_batch(table, batch, f"{epoch_prefix}-log-{i}", cfg)
            )
        if i < n_chunks:
            chunk = chunk_reader(i, n_chunks, r_hi - 1)
            stats.append(
                apply_change_batch(table, chunk, f"{epoch_prefix}-chunk-{i}", cfg)
            )
    return stats
