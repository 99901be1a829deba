"""Z-order (Morton) clustering keys for multi-dimensional file skipping.

Linear range clustering (`compact(cluster_by=[c])`) gives perfect
zone-map selectivity on ONE column and none on the others. Interleaving
the bits of several columns' rank indexes produces a space-filling
curve: sorting by the interleaved key and cutting the stream into
capped files yields files whose bounding boxes are small in EVERY
clustered dimension, so `scan(bounds=...)` prunes on any of them (the
Delta `OPTIMIZE ZORDER BY` / Iceberg z-order rewrite shape — public
designs; implementation original).

Everything is a pure column-expression tree (whole-stage codegen, no
UDFs): each column is normalized to a `bits`-wide integer rank via a
fixed (lo, hi) range — computed by the caller in one min/max
aggregation — then ranks are bit-interleaved with shift/and/or
arithmetic: bit i of column j lands at position i*ncols + j. 8 bits x
<=8 columns fits a long.

Range-based ranking (vs exact quantiles) keeps the expression
deterministic and shuffle-free; skewed columns degrade file-box
tightness but never correctness — zone-map pruning remains a pure
optimization over manifest bounds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MAX_COLS = 8


def column_ranges(df: DataFrame, cols: list[str]) -> list[tuple[str, float, float]]:
    """One aggregation pass: (col, min, max) as doubles for each
    clustered column (numeric / timestamp castable)."""
    aggs = []
    for c in cols:
        aggs.append(F.min(F.col(c).cast("double")).alias(f"_lo_{c}"))
        aggs.append(F.max(F.col(c).cast("double")).alias(f"_hi_{c}"))
    row = df.agg(*aggs).first()
    out = []
    for c in cols:
        lo = row[f"_lo_{c}"]
        hi = row[f"_hi_{c}"]
        out.append((c, float(lo if lo is not None else 0.0),
                    float(hi if hi is not None else 0.0)))
    return out


def zorder_key(ranges: list[tuple[str, float, float]], bits: int = 8) -> Column:
    """Morton key column from per-column fixed ranges. NULLs rank 0
    (they cluster together at the curve origin).

    `bits` auto-shrinks so bits*ncols fits a signed long (e.g. 8
    columns at the default 8 bits run at 7 bits each): rank coarseness
    degrades file-box tightness gracefully, whereas raising was a trap
    — the column-count check passed and then the width check threw."""
    n = len(ranges)
    if not 1 <= n <= MAX_COLS:
        raise ValueError(f"zorder supports 1..{MAX_COLS} columns, got {n}")
    bits = min(bits, 63 // n)
    if bits < 1:
        raise ValueError("too many columns for a signed-long morton key")
    top = (1 << bits) - 1
    ranks = []
    for c, lo, hi in ranges:
        span = hi - lo
        if span <= 0:
            ranks.append(F.lit(0).cast("long"))
            continue
        idx = F.floor((F.col(c).cast("double") - F.lit(lo)) / F.lit(span) * (1 << bits))
        idx = F.least(F.lit(top), F.greatest(F.lit(0), idx)).cast("long")
        ranks.append(F.coalesce(idx, F.lit(0).cast("long")))
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, r in enumerate(ranks):
            bit = F.shiftright(r, i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * n + j))
    return z
