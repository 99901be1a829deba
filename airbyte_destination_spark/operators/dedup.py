"""Last-writer-wins reduce over a change batch (O11) — plain and salted.

Semantics: per key, keep the single row with the greatest version
(ReplacingMergeTree(Ver) as configured by the reference at
/root/reference/internal/connector/destination.go:337-351; proven by its
e2e fixture where the later `updated_at` wins, e2e/main_test.go:86-105).

Two physical strategies:

- `lww_reduce`: one shuffle, window row_number. Right when keys are
  roughly uniform — Catalyst turns it into a single hash exchange +
  in-partition sort, whole-stage-codegen'd.

- `lww_reduce_salted`: two-phase for skewed keys. A hot key (one doc_id
  receiving a large fraction of 10^10 updates) makes one reducer
  partition the straggler; salting splits each key across `n_salts`
  sub-reducers, reduces per (key, salt), then re-reduces the n_salts
  survivors per key. Phase-2 input is <= n_salts rows per key, so the
  second shuffle is tiny. This is the classic two-phase skew reduce
  (the reference is single-threaded, so it never faces this — SURVEY
  O17).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _order(version_cols: list[str], tiebreak_cols: list[str]) -> list:
    cols = [F.col(c).desc_nulls_last() for c in version_cols]
    cols += [F.col(c).desc_nulls_last() for c in tiebreak_cols]
    return cols


def lww_reduce(
    df: DataFrame,
    key_cols: list[str],
    version_cols: list[str],
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Keep, per key, the row with the greatest (version, tiebreak)."""
    w = Window.partitionBy(*key_cols).orderBy(*_order(version_cols, tiebreak_cols or []))
    return df.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1).drop("_rn")


def lww_reduce_agg(
    df: DataFrame,
    key_cols: list[str],
    version_cols: list[str],
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """LWW reduce as a hash aggregation: max_by(row, (version, tiebreak)).

    The scale path. Unlike the window variant (which shuffles EVERY row
    to its key's partition, then sorts), an aggregate gets map-side
    partial combine: each input partition pre-reduces its local rows per
    key before the shuffle, so a hot key contributes at most one row per
    upstream partition to the exchange. Partial aggregation is built-in
    salting — no manual two-phase needed — and the whole thing is one
    Exchange + HashAggregate pair under whole-stage codegen.

    Struct comparison in Spark is lexicographic field-by-field, so
    max_by over struct(version..., tiebreak...) picks the same winner
    the window variant does.
    """
    other = [c for c in df.columns if c not in key_cols]
    ord_cols = [F.col(c) for c in version_cols] + [F.col(c) for c in (tiebreak_cols or [])]
    payload = F.struct(*[F.col(c) for c in other])
    agg = df.groupBy(*key_cols).agg(F.max_by(payload, F.struct(*ord_cols)).alias("_w"))
    return agg.select(*key_cols, *[F.col(f"_w.{c}").alias(c) for c in other])


def lww_reduce_salted(
    df: DataFrame,
    key_cols: list[str],
    version_cols: list[str],
    tiebreak_cols: list[str] | None = None,
    n_salts: int = 16,
    salt_source_col: str | None = None,
) -> DataFrame:
    """Two-phase LWW reduce for skewed keys.

    Salt is derived from a high-cardinality column (default: the first
    version column) so one key's rows spread across `n_salts` partitions
    deterministically.
    """
    src = salt_source_col or version_cols[0]
    salted = df.withColumn("_salt", F.pmod(F.xxhash64(F.col(src)), F.lit(n_salts)))
    w1 = Window.partitionBy(*key_cols, "_salt").orderBy(
        *_order(version_cols, tiebreak_cols or [])
    )
    phase1 = (
        salted.withColumn("_rn", F.row_number().over(w1)).where(F.col("_rn") == 1).drop("_rn")
    )
    w2 = Window.partitionBy(*key_cols).orderBy(*_order(version_cols, tiebreak_cols or []))
    return (
        phase1.withColumn("_rn", F.row_number().over(w2))
        .where(F.col("_rn") == 1)
        .drop("_rn", "_salt")
    )
