"""Incremental materialized-aggregate maintenance from a change feed.

The reference connector lands raw change streams into a warehouse whose
rollups are recomputed by full scans downstream. At 10^10 rows a daily
full rescan of the fact table to refresh a per-dimension aggregate is
the single most expensive job in the pipeline; the lakehouse answer is
to maintain the aggregate from the change data feed instead: each CDF
row contributes its measures SIGNED (+post-image, -pre-image) to its
dimension bucket, so the refresh cost scales with the CHANGE batch, not
the table.

Requires the pre-image CDF shape (``table_changes(pre_images=True)``):
an update contributes -pre under its old dimension value and +post
under the new one, so dimension-moving updates are handled with no
special casing.
"""

from __future__ import annotations

from typing import Dict, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PLUS = ("insert", "update_postimage")
_MINUS = ("delete", "update_preimage")


def rollup_snapshot(
    df: DataFrame, dims: Sequence[str], measures: Dict[str, str]
) -> DataFrame:
    """Full-scan aggregate in the maintained shape: dims, n_rows, one
    summed column per ``measures`` entry (out_name -> source col)."""
    return df.groupBy(*dims).agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[F.sum(src).alias(out) for out, src in measures.items()],
    )


def maintain_rollup(
    snapshot_agg: DataFrame,
    cdf: DataFrame,
    dims: Sequence[str],
    measures: Dict[str, str],
) -> DataFrame:
    """Advance ``snapshot_agg`` (produced by :func:`rollup_snapshot` at
    some version v) to the version ``cdf`` leads to, touching only the
    changed keys. Groups whose row count falls to zero disappear,
    matching a full recompute. Plan: one groupBy over the (batch-sized)
    CDF + one groupBy over the union with the (dimension-sized) stale
    aggregate — the table itself is never rescanned.
    """
    sign = (
        F.when(F.col("change_type").isin(*_PLUS), F.lit(1))
        .when(F.col("change_type").isin(*_MINUS), F.lit(-1))
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        "maintain_rollup needs a pre-image CDF "
                        "(table_changes(pre_images=True)); got change_type="
                    ),
                    F.col("change_type"),
                )
            )
        )
    )
    deltas = (
        cdf.withColumn("__sign", sign)
        .groupBy(*dims)
        .agg(
            F.sum("__sign").alias("n_rows"),
            *[
                F.sum(F.col("__sign") * F.col(src)).alias(out)
                for out, src in measures.items()
            ],
        )
    )
    return (
        snapshot_agg.unionByName(deltas)
        .groupBy(*dims)
        .agg(
            F.sum("n_rows").alias("n_rows"),
            *[F.sum(out).alias(out) for out in measures],
        )
        .where(F.col("n_rows") > 0)
    )


def rollup_minmax_snapshot(
    df: DataFrame,
    dims: Sequence[str],
    col: str,
    measures: Dict[str, str] | None = None,
) -> DataFrame:
    """Full-scan aggregate in the min/max-maintained shape: dims,
    n_rows, min_<col>, max_<col>, plus one summed column per optional
    ``measures`` entry (out_name -> source col)."""
    return df.groupBy(*dims).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min(col).alias(f"min_{col}"),
        F.max(col).alias(f"max_{col}"),
        *[F.sum(src).alias(out) for out, src in (measures or {}).items()],
    )


def maintain_rollup_minmax(
    snapshot_agg: DataFrame,
    cdf: DataFrame,
    base_state: DataFrame,
    dims: Sequence[str],
    col: str,
    measures: Dict[str, str] | None = None,
) -> DataFrame:
    """Advance a MIN/MAX aggregate (produced by
    :func:`rollup_minmax_snapshot`) using the pre-image CDF.

    MIN/MAX are not signed-additive: an insert can only EXTEND an
    extremal (``least/greatest`` fold, no rescan), but removing a row
    whose value ties the group's stored extremal leaves the true new
    extremal unknown — the textbook non-distributive-aggregate IVM
    case. The classic answer, implemented here: fold the clean groups
    algebraically and RECOMPUTE only the dirty ones.

    A group is dirty iff some removed (-pre/delete) value reaches its
    post-fold candidate boundary (``minus_min <= candidate_min`` or
    ``minus_max >= candidate_max``) — removals strictly inside the
    (candidate_min, candidate_max) interval can never change either
    extremal. Dirty groups are re-aggregated from ``base_state`` (the
    POST-change snapshot, e.g. ``table.read(spark)``) through a
    dims-semijoin, so the rescan touches only the dirty groups' rows:
    refresh cost = O(change batch) + O(rows of extremal-dirty groups),
    never O(table). For a base bucketed or secondary-indexed on dims
    the semijoin additionally prunes at the file level.

    Groups whose row count falls to zero disappear (their recompute
    finds no rows). NULL values never enter min/max (Spark aggregate
    semantics) and a removed NULL can't dirty a group — but every row
    counts toward n_rows.

    Optional additive ``measures`` (out_name -> source col) ride the
    same union + groupBy as signed sums — one maintenance pass yields
    the combined count/sum/min/max shape, dirty groups recompute all of
    it together.
    """
    measures = measures or {}
    sign = (
        F.when(F.col("change_type").isin(*_PLUS), F.lit(1))
        .when(F.col("change_type").isin(*_MINUS), F.lit(-1))
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        "maintain_rollup_minmax needs a pre-image CDF "
                        "(table_changes(pre_images=True)); got change_type="
                    ),
                    F.col("change_type"),
                )
            )
        )
    )
    mn, mx = f"min_{col}", f"max_{col}"
    dtype = dict(zip(cdf.schema.names, cdf.schema))[col].dataType
    null_v = F.lit(None).cast(dtype)
    is_plus = F.col("__sign") == 1
    # union + ONE groupBy (like maintain_rollup) rather than a join on
    # dims: groupBy groups NULL dimension values, a join would not.
    # Stored extremals ride the plus slots (min over {stored, inserts}
    # IS the candidate fold); minus values ride their own slots so the
    # dirty test can compare them to the candidates afterwards.
    stored = snapshot_agg.select(
        *dims,
        F.col("n_rows").cast("long").alias("__dn"),
        F.col(mn).alias("__pmin"),
        F.col(mx).alias("__pmax"),
        null_v.alias("__mmin"),
        null_v.alias("__mmax"),
        *[F.col(out) for out in measures],
    )
    changes = cdf.withColumn("__sign", sign).select(
        *dims,
        F.col("__sign").cast("long").alias("__dn"),
        F.when(is_plus, F.col(col)).alias("__pmin"),
        F.when(is_plus, F.col(col)).alias("__pmax"),
        F.when(~is_plus, F.col(col)).alias("__mmin"),
        F.when(~is_plus, F.col(col)).alias("__mmax"),
        *[(F.col("__sign") * F.col(src)).alias(out) for out, src in measures.items()],
    )
    merged = (
        stored.unionByName(changes)
        .groupBy(*dims)
        .agg(
            F.sum("__dn").alias("n_rows"),
            F.min("__pmin").alias("__cmin"),
            F.max("__pmax").alias("__cmax"),
            F.min("__mmin").alias("__mmin"),
            F.max("__mmax").alias("__mmax"),
            *[F.sum(out).alias(out) for out in measures],
        )
        .select(
            *dims,
            "n_rows",
            "__cmin",
            "__cmax",
            *measures,
            (
                F.coalesce(F.col("__mmin") <= F.col("__cmin"), F.lit(False))
                | F.coalesce(F.col("__mmax") >= F.col("__cmax"), F.lit(False))
            ).alias("__dirty"),
        )
        .where(F.col("n_rows") > 0)
    )
    clean = merged.where(~F.col("__dirty")).select(
        *dims, "n_rows", F.col("__cmin").alias(mn), F.col("__cmax").alias(mx),
        *measures,
    )
    dirty_groups = merged.where(F.col("__dirty")).select(*dims)
    recomputed = rollup_minmax_snapshot(
        base_state.join(dirty_groups, list(dims), "leftsemi"), dims, col, measures
    )
    return clean.unionByName(recomputed)


class RollupSpec:
    """Declaration of a derived aggregate table maintained from a base
    table's change feed: GROUP BY ``dims``, one SUM column per
    ``measures`` entry (out_name -> base column) plus n_rows; with
    ``minmax`` set to a base column, min_<col>/max_<col> are maintained
    too (dirty-group recompute path, see maintain_rollup_minmax)."""

    def __init__(
        self,
        dims,
        measures,
        version_col: str = "_src_version",
        minmax: str | None = None,
    ):
        self.dims = list(dims)
        self.measures = dict(measures)
        self.version_col = version_col
        self.minmax = minmax

    @property
    def val_cols(self) -> list[str]:
        cols = ["n_rows"]
        if self.minmax is not None:
            cols += [f"min_{self.minmax}", f"max_{self.minmax}"]
        return cols + list(self.measures)


def apply_with_rollup(
    main,
    rollup,
    batch: DataFrame,
    epoch_id: str,
    cfg=None,
    spec: RollupSpec | None = None,
):
    """Apply one change batch to ``main`` AND advance the derived
    ``rollup`` table, each exactly once.

    The rollup merge is driven by the (v-1, v) pre-image change feed of
    the epoch's own commit, touching only the dimension groups the
    batch changed — refresh cost scales with the batch. Idempotency is
    two independent epoch markers: if the process dies between the two
    commits, the replay skips the main merge (its marker exists),
    recovers this epoch's version window from the commit record
    (``epoch_commit_version``), and completes the rollup merge; a full
    replay skips both. Zero-count groups become tombstone deletes so
    the derived table tracks a recompute exactly.

    Reference frame: the reference's warehouse recomputes rollups by
    rescanning landed data; here derived state rides the same
    exactly-once commit protocol as the base table.
    """
    from airbyte_destination_spark.streaming.pipeline import (
        IngestConfig,
        apply_change_batch,
    )

    spec = spec or RollupSpec(["stream"], {})
    cfg = cfg or IngestConfig()
    spark = batch.sparkSession

    stats = apply_change_batch(main, batch, epoch_id, cfg)
    if rollup.exists() and rollup.is_epoch_applied(epoch_id):
        return stats

    v_after = (
        main.epoch_commit_version(epoch_id) if stats.skipped else stats.version
    )
    if v_after is None:
        raise RuntimeError(
            f"cannot recover rollup for epoch {epoch_id}: its commit "
            "record was expired — recompute the rollup from a snapshot"
        )
    cdf = main.table_changes(
        spark, v_from=v_after - 1, v_to=v_after, pre_images=True
    ).localCheckpoint(eager=True)  # one CDF computation serves the
    # affected-group probe, the fold, the delete anti-join and the
    # rollup merge's lineage+write jobs (see secondary_index)
    affected = cdf.select(*spec.dims).distinct()

    mm_cols = (
        [] if spec.minmax is None
        else [f"min_{spec.minmax}", f"max_{spec.minmax}"]
    )
    if rollup.exists():
        base = (
            rollup.read(spark)
            .join(affected, spec.dims, "leftsemi")
            .select(*spec.dims, "n_rows", *mm_cols, *spec.measures)
        )
    else:
        base = cdf.select(
            *spec.dims,
            F.lit(0).cast("long").alias("n_rows"),
            *[F.col(spec.minmax).alias(c) for c in mm_cols],
            *[F.col(src).alias(out) for out, src in spec.measures.items()],
        ).limit(0)

    if spec.minmax is None:
        updated = maintain_rollup(base, cdf, spec.dims, spec.measures)
    else:
        # dirty-group recompute reads the POST-commit base snapshot —
        # pinned to this epoch's version so a concurrent later epoch
        # can't leak into the recomputed groups
        updated = maintain_rollup_minmax(
            base,
            cdf,
            main.read(spark, version=v_after),
            spec.dims,
            spec.minmax,
            spec.measures,
        )
    ups = updated.select(
        *spec.dims,
        *spec.val_cols,
        F.lit(v_after).alias(spec.version_col),
        F.lit("U").alias("op"),
    )
    up_types = {f.name: f.dataType for f in updated.schema.fields}
    dels = (
        affected.join(updated.select(*spec.dims), spec.dims, "leftanti")
        .select(
            *spec.dims,
            *[F.lit(None).cast(up_types[c]).alias(c) for c in spec.val_cols],
            F.lit(v_after).alias(spec.version_col),
            F.lit("D").alias("op"),
        )
    )
    out = ups.unionByName(dels)

    if not rollup.exists():
        from pyspark.sql import types as T

        fields = [f for f in out.schema.fields if f.name != "op"]
        rollup.create(
            T.StructType(fields),
            spec.dims,
            spec.version_col,
            n_buckets=min(8, cfg.n_buckets),
        )
    rollup.merge(out, epoch_id=epoch_id)
    return stats
