"""SCD Type-2 history from an ordered change log.

The reference's pipeline only materializes the *final* state of each key
(ReplacingMergeTree keeps the max-version row,
/root/reference/internal/connector/destination.go:337-351). The standard
warehouse companion is the slowly-changing-dimension Type-2 view of the
same log: every non-delete change opens a version row stamped
``[valid_from, valid_to)`` in version order, the next change to the key
(update OR delete) closes it, and the open row per key is flagged
``is_current``. A key whose last event is a delete has no current row —
its final version is closed by the delete's version.

Physical shape (the 100 TB question): ONE hash exchange on the key plus
an in-partition sort — the single ``lead(order_col)`` window carries the
whole derivation; there is no self-join of the log to itself (the naive
"join each change to the next change" formulation shuffles the log
twice and cross-products hot keys). Per-partition state is bounded by
the per-key history, which Spark's window operator spills to disk, so a
10^10-event log is exactly as safe as any keyed window aggregation.

Incremental maintenance note: because ``valid_to`` of the latest closed
row only ever depends on the NEXT change of the same key, an
incremental refresh of a materialized SCD2 table needs only (a) the new
change batch and (b) the per-key current rows of the existing table —
the engine's keyed ``read_keys`` point-lookup path serves (b) without a
table scan. ``scd2_apply`` below implements that refresh step.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(
    log: DataFrame,
    keys: Sequence[str],
    order_col: str = "change_lsn",
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Full-log SCD2 derivation: one keyed window, no self-join.

    Returns the input's payload columns plus ``valid_from`` (the
    change's own version), ``valid_to`` (the next change's version for
    the key, NULL while open) and ``is_current``. Delete events close
    their predecessor (they participate in the ``lead`` ordering) but
    emit no row of their own.
    """
    keys = list(keys)
    w = Window.partitionBy(*keys).orderBy(F.col(order_col).asc())
    payload = [c for c in log.columns if c not in set(keys) | {order_col, op_col}]
    h = log.withColumn("valid_to", F.lead(order_col).over(w))
    return h.where(F.col(op_col) != delete_op).select(
        *keys,
        F.col(order_col).alias("valid_from"),
        "valid_to",
        F.col("valid_to").isNull().alias("is_current"),
        *payload,
    )


def scd2_apply(
    current: DataFrame,
    batch: DataFrame,
    keys: Sequence[str],
    order_col: str = "change_lsn",
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Incremental SCD2 refresh: fold a new ordered change batch into the
    open rows of an existing history table.

    ``current`` must be the ``is_current`` slice of the history (one open
    row per live key — the engine's ``read_keys`` over the batch's keys
    yields exactly this without scanning closed history). Returns the
    REPLACEMENT rows for the touched keys: the re-closed previous
    current rows plus the batch's own version rows. Untouched keys and
    already-closed history never enter the job, so refresh cost is
    O(batch), not O(table).

    Every batch change must order after the stored current row of its
    key; out-of-order (late) versions would require re-opening closed
    history, which is the full-log ``scd2_history`` job's business.
    """
    keys = list(keys)
    payload = [c for c in batch.columns if c not in set(keys) | {order_col, op_col}]
    cur = current.select(
        *keys,
        F.col("valid_from").alias(order_col),
        F.lit("U").alias(op_col),
        *payload,
    )
    # The previous current row re-enters the window at its own version;
    # lead() then closes it with the batch's first change, and the
    # batch folds exactly like a log suffix.
    return scd2_history(
        cur.unionByName(batch.select(*keys, order_col, op_col, *payload)),
        keys,
        order_col=order_col,
        op_col=op_col,
        delete_op=delete_op,
    )
