"""Incrementally-maintained materialized JOIN view (fact LEFT JOIN dim).

The reference connector lands each stream as its own warehouse table
and leaves joins to query time (/root/reference/internal/connector/
destination.go routes per-stream batches to independent tables); at
query volume that means re-paying a fact-sized shuffle join on every
dashboard hit. The lakehouse answer is a materialized join view
maintained from BOTH base tables' change feeds, so refresh cost scales
with the change batches:

* a FACT change (insert/update) re-joins only the changed rows against
  the dim's current snapshot; a fact delete deletes the view row;
* a DIM change fans out to only the fact rows holding the changed join
  keys — fetched through the join-key secondary index when one is
  supplied (index probe + `read_keys` bucket pruning: no fact scan),
  or a key semijoin against the pinned fact snapshot otherwise;
* the view is itself a lake table keyed by the fact key, so the merge
  inherits snapshots, exactly-once epoch markers, time travel, and the
  change feed (views can be chained).

View semantics are LEFT JOIN: every live fact row appears exactly
once; dim columns are NULL when the join key is absent (or deleted —
a dim delete downgrades matching view rows to NULLs, it does not drop
them).

The view table is deliberately created WITHOUT a version column. A
joined row breaks the LWW invariant "one (key, version) is one row":
a dim-driven re-join changes the payload of an unchanged fact row, so
the same (fact key, fact version) legitimately carries different
payloads over time. Versioning the view by the fact version would
make its change feed silently MISS dim-driven updates (version-equal
rows read as unchanged — caught by the chained-rollup test). Version-
less, `LakeTable.merge` orders batch-over-existing — correct because
refreshes are serialized through the consumer offsets, so arrival
order IS derivation order — and `table_changes` falls back to
payload-hash change detection, so chained consumers (a rollup
maintained from the view's own feed) see every change.

Exactly-once: the refresh polls both feeds through named consumers,
merges one view batch stamped ``jv-<fact_v>-<dim_v>``, then acks both.
A crash between merge and ack re-polls the same window; the identical
epoch id makes the replayed merge a no-op, after which the acks land
(the same offset window always yields the same net changes).

SINGLE REFRESHER per (view, name): because ordering is by arrival
(batch-over-existing), two refreshers racing the same consumers can
apply an older window's batch AFTER a superset window's — regressing
joined payloads until the next change touches them. Run one maintainer
per view (the same single-writer rule streaming engines apply to a
sink); crash-and-restart of that one maintainer is what the epoch
marker + ack protocol makes safe, not concurrent maintainers.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from airbyte_destination_spark.lake import LakeTable


def _consumer_names(name: str) -> Tuple[str, str]:
    return f"__jv_{name}_fact", f"__jv_{name}_dim"


def _validate(fact: LakeTable, dim: LakeTable, fk: str, dim_cols: Dict[str, str]):
    mf, md = fact.manifest(), dim.manifest()
    f_schema = T.StructType.fromJson(mf["schemas"][str(mf["schema_id"])])
    d_schema = T.StructType.fromJson(md["schemas"][str(md["schema_id"])])
    if len(md["key_cols"]) != 1:
        raise ValueError(
            f"join view requires a single-column dim key, got {md['key_cols']}"
        )
    if fk not in f_schema.fieldNames():
        raise ValueError(f"join key {fk!r} not in fact schema")
    for out, src in dim_cols.items():
        if src not in d_schema.fieldNames():
            raise ValueError(f"dim column {src!r} not in dim schema")
        if out in f_schema.fieldNames():
            raise ValueError(f"view column {out!r} collides with a fact column")
    return mf, md, f_schema, d_schema


def create_join_view(
    fact: LakeTable,
    dim: LakeTable,
    view_root: str,
    fk: str,
    dim_cols: Dict[str, str],
    n_buckets: int | None = None,
) -> LakeTable:
    """Create the (empty) view table: all fact columns plus one
    nullable column per ``dim_cols`` entry (out_name -> dim column),
    keyed like the fact — but VERSION-LESS (see module docstring) —
    and bucketed on the fact key so refresh merges co-partition with
    fact-keyed upserts."""
    mf, md, f_schema, d_schema = _validate(fact, dim, fk, dim_cols)
    fields = list(f_schema.fields)
    fields += [
        T.StructField(out, d_schema[src].dataType, True)
        for out, src in dim_cols.items()
    ]
    view = LakeTable(view_root)
    view.create(
        T.StructType(fields),
        key_cols=mf["key_cols"],
        version_col=None,
        n_buckets=n_buckets or mf["n_buckets"],
    )
    return view


def join_snapshot(
    spark: SparkSession,
    fact: LakeTable,
    dim: LakeTable,
    fk: str,
    dim_cols: Dict[str, str],
    fact_version: int | None = None,
    dim_version: int | None = None,
) -> DataFrame:
    """Full-recompute LEFT JOIN in the maintained shape — the bootstrap
    / audit twin of the incremental refresh."""
    _, md, _, _ = _validate(fact, dim, fk, dim_cols)
    dkey = md["key_cols"][0]
    f = fact.read(spark, version=fact_version)
    d = dim.read(spark, version=dim_version).select(
        F.col(dkey).alias("__dk"),
        *[F.col(src).alias(out) for out, src in dim_cols.items()],
    )
    return f.join(d, F.col(fk) == F.col("__dk"), "left").drop("__dk")


def refresh_join_view(
    spark: SparkSession,
    fact: LakeTable,
    dim: LakeTable,
    view: LakeTable,
    fk: str,
    dim_cols: Dict[str, str],
    name: str = "view",
    fk_index: Optional[LakeTable] = None,
    max_index_fanout: int = 100_000,
) -> Optional[Tuple[int, int]]:
    """Advance ``view`` to the base tables' current snapshots using only
    their change feeds. Returns (fact_version, dim_version) the view now
    reflects, or None when already current.

    ``fk_index``: a secondary index on the fact's join-key column
    (operators.secondary_index) — when supplied, dim-driven fan-out
    probes the index and reads only the fact buckets holding matching
    keys (the at-scale path: a hot dim key's update touches index
    buckets + the matching fact files, never a fact scan). The index is
    refreshed first, so it reflects at least the polled fact version.
    Without it, fan-out is a key semijoin against the pinned fact
    snapshot — one fact scan per refresh, fine for small facts.
    """
    mf, md, _, _ = _validate(fact, dim, fk, dim_cols)
    fkeys = mf["key_cols"]
    dkey = md["key_cols"][0]
    cf, cd = _consumer_names(name)

    f_changes, f_to = fact.poll_changes(spark, cf)
    d_changes, d_to = dim.poll_changes(spark, cd)
    if f_changes is None and d_changes is None:
        return None
    # materialize the change window ONCE (see secondary_index.refresh_
    # index). The assembled view batch below is checkpointed before the
    # merge, which covers every reference on the semijoin path with a
    # single materialization job; only the INDEX fan-out path collects
    # the affected keys before the batch exists, so the dim feed is
    # pre-materialized just for it.
    if d_changes is not None and fk_index is not None:
        d_changes = d_changes.localCheckpoint(eager=True)

    dim_state = dim.read(spark, version=d_to or None).select(
        F.col(dkey).alias("__dk"),
        *[F.col(src).alias(out) for out, src in dim_cols.items()],
    )

    fact_cols = fact.read(spark, version=f_to or None).columns
    ups_src = None
    dels = None
    if f_changes is not None:
        live = f_changes.where(F.col("change_type") != "delete")
        ups_src = live.select(*fact_cols)
        dels = f_changes.where(F.col("change_type") == "delete").select(*fkeys)

    if d_changes is not None:
        # any change_type: the dim key is the join key and is immutable
        # per row, so pre/post images carry the same fan-out key
        affected = d_changes.select(F.col(dkey).alias("__fk")).distinct()
        if fk_index is not None:
            from airbyte_destination_spark.operators.secondary_index import (
                lookup,
                refresh_index,
            )

            refresh_index(spark, fact, fk_index, fk)
            vals = [
                r[0] for r in affected.limit(max_index_fanout + 1).collect()
            ]
            if len(vals) > max_index_fanout:
                raise ValueError(
                    f"dim change fans out to more than {max_index_fanout} "
                    "join keys — refresh without fk_index (semijoin path)"
                )
            fanout = lookup(
                spark, fact, fk_index, vals, max_keys=max_index_fanout
            ).select(*fact_cols)
        else:
            fanout = (
                fact.read(spark, version=f_to or None)
                .join(affected, F.col(fk) == F.col("__fk"), "leftsemi")
                .select(*fact_cols)
            )
        if ups_src is not None:
            # fact-feed rows already carry their (fresher) post images
            fanout = fanout.join(ups_src.select(*fkeys), fkeys, "leftanti")
            ups_src = ups_src.unionByName(fanout)
        else:
            ups_src = fanout

    ups = (
        ups_src.join(dim_state, F.col(fk) == F.col("__dk"), "left")
        .drop("__dk")
        .withColumn("op", F.lit("U"))
    )
    batch = ups
    if dels is not None:
        null_cols = [c for c in ups.columns if c not in (*fkeys, "op")]
        ups_types = {f.name: f.dataType for f in ups.schema.fields}
        batch = batch.unionByName(
            dels.select(
                *fkeys,
                *[F.lit(None).cast(ups_types[c]).alias(c) for c in null_cols],
                F.lit("D").alias("op"),
            )
        )

    # one computation of the whole refresh batch (both feeds' CDF
    # joins, the dim-state join, the fan-out): the merge's lineage and
    # write jobs read the materialized blocks instead of re-running it
    batch = batch.localCheckpoint(eager=True)
    view.merge(batch, epoch_id=f"jv-{f_to}-{d_to}")
    if f_changes is not None:
        fact.ack(cf, f_to)
    if d_changes is not None:
        dim.ack(cd, d_to)
    return f_to, d_to
