"""Point-in-time (as-of) joins, Spark-first.

The reference connector has no relational engine of its own (it ships
records to a hosted warehouse — reference `main.go`, `destination.go`),
but point-in-time attribution over the tables it lands is the canonical
downstream query: "for each event, the most recent prior X by the same
key". A naive Spark formulation is a range join — an inequality-only
join Catalyst can only execute as a per-key cross-product (or a
BroadcastNestedLoopJoin), both of which explode quadratically on hot
keys and are unusable at 10^10 rows.

This implementation never joins. Both inputs are tagged and UNIONed,
then a running ``last(payload, ignorenulls=True)`` over a
key-partitioned, time-ordered window carries each right-side row
forward onto every later left-side row:

    cost = one shuffle on the key + a per-key sort.  Linear in |L|+|R|.

That is the plan shape a 1000-executor cluster wants: no Join operator
at all, no replication of either side, and skew on a hot key costs the
same as any window over that key (the sort), not |L_k| x |R_k|.

Semantics (backward as-of):
  for each left row (k, t_l): the right row (k, t_r) with the largest
  t_r <= t_l (inclusive; strictly < t_l when ``strict=True``). Ties on
  t_r are broken toward the LARGEST ``tiebreak`` value, making the
  result deterministic when the right side has duplicate timestamps.
  Left rows with no qualifying right row keep NULL payload (left-join
  semantics).
"""

from __future__ import annotations

from typing import Dict, Optional

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_T = "__asof_t"
_SIDE = "__asof_side"
_TB = "__asof_tb"
_P = "__asof_p"


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str,
    left_time: str,
    right_time: str,
    payload: Dict[str, Column],
    tiebreak: Optional[Column] = None,
    strict: bool = False,
) -> DataFrame:
    """Backward as-of join: attach, to every ``left`` row, ``payload``
    columns evaluated on the latest ``right`` row of the same ``key``
    at-or-before (before, if ``strict``) the left row's time.

    ``payload`` maps output column name -> Column over ``right``. Both
    frames must carry the join key under the same name ``key``. Output
    has all of ``left``'s columns plus the payload columns, one row per
    left row.
    """
    if not payload:
        raise ValueError("payload must name at least one output column")
    for c in payload:
        if c in left.columns:
            raise ValueError(f"payload column {c!r} collides with a left column")

    # At equal times the window order decides visibility: right rows
    # sorting BEFORE the left row means the left row sees them
    # (inclusive, t_r <= t_l); after means it doesn't (strict).
    right_rank, left_rank = (0, 1) if not strict else (1, 0)

    p = F.struct(*[c.alias(n) for n, c in payload.items()])
    rr = right.select(
        F.col(key),
        F.col(right_time).alias(_T),
        F.lit(right_rank).alias(_SIDE),
        (tiebreak if tiebreak is not None else F.lit(0)).alias(_TB),
        p.alias(_P),
    )
    ll = left.select(
        "*",
        F.col(left_time).alias(_T),
        F.lit(left_rank).alias(_SIDE),
        F.lit(0).alias(_TB),
        F.lit(None).cast(rr.schema[_P].dataType).alias(_P),
    )

    w = (
        Window.partitionBy(key)
        .orderBy(_T, _SIDE, _TB)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = F.last(_P, ignorenulls=True).over(w)
    return (
        ll.unionByName(rr, allowMissingColumns=True)
        .withColumn(_P, carried)
        .where(F.col(_SIDE) == F.lit(left_rank))
        .select(
            *[F.col(c) for c in left.columns],
            *[F.col(_P)[n].alias(n) for n in payload],
        )
    )
