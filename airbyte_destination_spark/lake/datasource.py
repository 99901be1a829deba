"""`lake_changes` — a Spark Python Data Source (the pyspark 4
`pyspark.sql.datasource` API) exposing a lake table's committed change
stream to Structured Streaming:

    spark.dataSource.register(LakeChangesDataSource)
    df = (spark.readStream.format("lake_changes")
          .option("path", table_root)
          .load())

Each micro-batch delivers the rows committed by the data commits
(operation merge/append) in a version window — the raw change tail
(winning upserts AND tombstones, `_deleted` marks deletes), i.e. the
Delta CDF / Hudi incremental-query shape at the storage layer. This is
the composition point for downstream pipelines: a second engine (or a
derived-table job) can tail a lake table exactly like it tails the
original binlog.

Scale shape:
- Offsets are table versions — a monotone long read from the LATEST
  pointer; no data is touched at offset-resolution time.
- `partitions()` is metadata-only: one InputPartition per data FILE
  committed in the window (files are immutable; the manifest's `cv`
  stamp identifies each commit's files). Spark distributes partitions
  across executors.
- `read()` runs executor-side on plain pyarrow — batched columnar
  reads, no per-row Python — aligning old-schema files to the current
  schema (schema evolution: missing columns null-padded, widened types
  upcast).

Semantics notes:
- MERGE-ON-READ tables only: a MOR commit's delta files contain
  exactly the batch's winning rows + tombstones, so the file set IS
  the change batch. A COW merge rewrites whole buckets (old rows mixed
  with new), so per-commit row attribution would be wrong — the
  source refuses cow tables rather than emitting garbage.
- Maintenance commits (compact / purge_tombstones / rebucket /
  rollback) rewrite or drop files without logical changes; their
  versions are SKIPPED, like Delta CDF skipping OPTIMIZE.
- Within one micro-batch, rows from multiple versions may interleave;
  `_change_version` orders them and the table's version_col orders
  within a key (the same contract the merge fold itself uses).
- The stream's schema is fixed at query START (standard Structured
  Streaming): files written under OLDER schemas are aligned up
  (null-pad / upcast); columns ADDED to the table mid-stream are not
  visible until the query restarts with the new schema — same
  contract as Delta's streaming source.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql import types as T

from airbyte_destination_spark.lake.table import _file_column_maps
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

_META_COLS = [
    T.StructField("_change_version", T.LongType(), False),
    T.StructField("_deleted", T.BooleanType(), True),
]
_DATA_OPS = ("merge", "append")
# physical rewrites / metadata squashes with NO logical changes — safe
# to skip silently (checkpoint commits no data files at all: its
# entries keep their original commit versions)
_MAINTENANCE_OPS = (
    "compact", "compact_tiered", "purge_tombstones", "rebucket", "create",
    "checkpoint",
)


@dataclass
class _FilePartition(InputPartition):
    path: str
    version: int
    file_schema_json: str
    target_schema_json: str
    # composed original->current column names for files written under
    # older schema ids (column-rename evolution); "" = no renames
    rename_map_json: str = ""
    # {col: initial_default} for columns added with a default after
    # this file was written (Iceberg v3 default-value evolution)
    defaults_json: str = ""
    # columns re-added AFTER this file was written whose bytes in the
    # file are a prior life (dropped then re-added) — force-dropped
    # before alignment so stale values cannot resurface
    prior_drop_json: str = ""


class LakeChangesDataSource(DataSource):
    """See module docstring. Options:

    - `path` (required): table root directory.
    - `startingVersion` (default 0): deliver commits AFTER this
      version (0 = from the beginning).
    """

    @classmethod
    def name(cls) -> str:
        return "lake_changes"

    def _table(self):
        from airbyte_destination_spark.lake import LakeTable

        root = self.options.get("path")
        if not root:
            raise ValueError("lake_changes requires .option('path', <table root>)")
        return LakeTable(root)

    def schema(self) -> T.StructType:
        t = self._table()
        m = t.manifest()
        if m.get("merge_strategy", "cow") != "mor":
            raise ValueError(
                "lake_changes streams MOR tables only (a COW merge rewrites "
                "whole buckets, so per-commit row attribution is undefined)"
            )
        base = T.StructType.fromJson(m["schemas"][str(m["schema_id"])])
        return T.StructType(base.fields + _META_COLS)

    def streamReader(self, schema: T.StructType) -> "LakeChangesStreamReader":
        return LakeChangesStreamReader(
            self._table(), schema, int(self.options.get("startingversion", 0))
        )

    def reader(self, schema: T.StructType) -> "LakeChangesBatchReader":
        """Batch mode (`spark.read.format("lake_changes")`): the change
        tail of one version window — Delta's batch CDF shape. Options:
        `startingVersion` (exclusive, default 0), `endingVersion`
        (inclusive, default: current)."""
        t = self._table()
        cur = t.current_version()
        end = self.options.get("endingversion")
        end_v = int(end) if end is not None else cur
        if end_v > cur:
            raise ValueError(
                f"endingVersion {end_v} is beyond the table's current "
                f"version {cur}"
            )
        return LakeChangesBatchReader(
            t, schema, int(self.options.get("startingversion", 0)), end_v
        )


class LakeChangesBatchReader(DataSourceReader):
    def __init__(self, table, schema: T.StructType, start: int, end: int):
        self._sr = LakeChangesStreamReader(table, schema, start)
        self._start = start
        self._end = end

    def partitions(self):
        return self._sr.partitions(
            {"version": self._start}, {"version": self._end}
        )

    def read(self, partition):
        return self._sr.read(partition)


class LakeChangesStreamReader(DataSourceStreamReader):
    def __init__(self, table, schema: T.StructType, starting_version: int):
        self._t = table
        self._schema = schema
        self._start = starting_version

    def initialOffset(self) -> dict:
        return {"version": self._start}

    def latestOffset(self) -> dict:
        return {"version": self._t.current_version()}

    def partitions(self, start: dict, end: dict):
        target_json = json.dumps(self._schema.jsonValue())
        parts: list[_FilePartition] = []
        end_v = int(end["version"])
        # rename transitions are cumulative in every manifest; the
        # WINDOW-END manifest covers every transition a served file
        # can need (a commit at v <= end only holds files with schema
        # ids <= its own, and the stale-schema guard below rejects
        # windows whose bound target predates a rename inside them)
        m_end = self._t.manifest(end_v) if end_v >= 1 else {}
        renames_end = m_end.get("renames")
        defaults_end = m_end.get("defaults") or {}
        adds_end = m_end.get("adds") or {}
        drops_end = m_end.get("drops") or {}
        names_end = (
            {
                f["name"]
                for f in m_end["schemas"][str(m_end["schema_id"])]["fields"]
            }
            if m_end
            else set()
        )
        meta = {f.name for f in _META_COLS}
        bound_is_current = (
            {f.name for f in self._schema.fields} - meta
        ) == names_end
        for v in range(int(start["version"]) + 1, end_v + 1):
            try:
                raw = self._t._read_raw(v)
            except FileNotFoundError:
                # history below the offset was expired: serving the
                # window would SILENTLY drop those commits' changes —
                # fail loudly instead (Delta's streaming source does
                # the same); the consumer must re-bootstrap from a
                # snapshot or a startingVersion inside retained history
                raise RuntimeError(
                    f"lake_changes offset {start['version']} is below the "
                    f"retained history of {self._t.root} (version {v} "
                    "expired); re-bootstrap the consumer"
                ) from None
            op = raw.get("operation") or ""
            if op in _MAINTENANCE_OPS:
                continue  # physical rewrite: no logical changes
            if op.startswith("add_column("):
                # metadata-only; a consumer bound pre-add simply never
                # projects the new column — no row changed, safe skip
                continue
            if op.startswith(("drop_column(", "rename(")):
                # metadata-only schema transitions. A consumer whose
                # bound schema matches the WINDOW-END state crosses
                # them like maintenance (the per-file rename /
                # prior-life / default machinery serves end-state
                # names); a consumer bound to any OTHER state is stale
                # — silently serving it would misname or null columns
                # (Delta CDF's schema-change discipline: fail loudly).
                if not bound_is_current:
                    raise RuntimeError(
                        f"lake_changes stream schema is stale: commit "
                        f"{v} of {self._t.root} is a column {op}; "
                        "restart the stream to bind the current schema"
                    )
                continue  # no data files commit at these versions
            if op not in _DATA_OPS:
                # delete_where / rollback ARE logical changes, but a
                # bucket rewrite can't attribute rows to the commit —
                # silently skipping would make a replica diverge (keep
                # GDPR-deleted rows forever). Fail like the COW case.
                raise RuntimeError(
                    f"lake_changes cannot stream commit {v} "
                    f"(operation {op!r}) of {self._t.root}: it changes "
                    "rows without per-commit attribution; re-bootstrap "
                    "the consumer from a snapshot past it"
                )
            m = self._t.manifest(v)
            schemas = m["schemas"]
            for entries in m["buckets"].values():
                for e in entries:
                    if int(e.get("cv", 0)) != v:
                        continue
                    # files written under a pre-rename schema id carry
                    # old on-disk names; the composed map (from this
                    # commit's cumulative renames) re-labels them
                    # before name-based alignment executor-side
                    # lineage-aware maps: renames that apply to THIS
                    # file's columns, plus the prior-life (dead
                    # lineage) names in the file's ON-DISK namespace —
                    # the executor drops the latter BEFORE applying
                    # the rename map, so stale bytes can't be
                    # relabeled into the current namespace
                    ren, prior = _file_column_maps(
                        renames_end, adds_end, drops_end,
                        str(e["schema_id"]),
                    )
                    parts.append(
                        _FilePartition(
                            path=os.path.join(self._t.root, e["path"]),
                            version=v,
                            file_schema_json=json.dumps(
                                schemas[str(e["schema_id"])]
                            ),
                            target_schema_json=target_json,
                            rename_map_json=json.dumps(ren) if ren else "",
                            defaults_json=(
                                json.dumps(defaults_end) if defaults_end else ""
                            ),
                            prior_drop_json=(
                                json.dumps(prior) if prior else ""
                            ),
                        )
                    )
        # Spark requires a non-empty partition list; a sentinel with no
        # path yields zero rows for an empty window
        return parts or [_FilePartition("", 0, "", "")]

    def read(self, partition: _FilePartition):
        if not partition.path:
            return iter(())
        return _read_aligned(partition)

    def commit(self, end: dict) -> None:
        pass  # Spark's checkpoint owns progress; table files are immutable


def _read_aligned(partition: _FilePartition):
    """Executor-side: read one immutable parquet file with pyarrow and
    align it to the stream schema — null-pad columns the file predates,
    upcast widened primitives, stamp _change_version, default _deleted
    to false for files written before tombstones existed."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pyspark.sql.pandas.types import to_arrow_schema

    target = T.StructType.fromJson(json.loads(partition.target_schema_json))
    arrow_target = to_arrow_schema(target)
    tbl = pq.read_table(partition.path)
    if partition.prior_drop_json:
        # prior-life force-drop FIRST, on on-disk names — before the
        # rename map can relabel stale bytes into the current namespace
        stale = [
            c for c in json.loads(partition.prior_drop_json)
            if c in tbl.column_names
        ]
        if stale:
            tbl = tbl.drop_columns(stale)
    if partition.rename_map_json:
        ren = json.loads(partition.rename_map_json)
        tbl = tbl.rename_columns([ren.get(c, c) for c in tbl.column_names])
    n = tbl.num_rows
    cols = []
    for fld in arrow_target:
        if fld.name == "_change_version":
            cols.append(pa.array([partition.version] * n, type=fld.type))
            continue
        if fld.name in tbl.column_names:
            col = tbl.column(fld.name)
            if col.type != fld.type:
                col = col.cast(fld.type)
            if fld.name == "_deleted":
                col = col.combine_chunks().fill_null(False)
            cols.append(col)
        elif fld.name == "_deleted":
            cols.append(pa.array([False] * n, type=fld.type))
        else:  # column added by schema evolution after this file:
            # initial default if one was declared, else null-pad
            dv = (
                json.loads(partition.defaults_json).get(fld.name)
                if partition.defaults_json
                else None
            )
            if dv is not None:
                cols.append(pa.array([dv] * n, type=fld.type))
            else:
                cols.append(pa.nulls(n, type=fld.type))
    out = pa.table(cols, schema=arrow_target)
    yield from out.to_batches(max_chunksize=1 << 16)
