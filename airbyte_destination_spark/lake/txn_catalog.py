"""Catalog-level atomic multi-table commits.

A CDC epoch usually lands in SEVERAL tables at once — the base table,
secondary indexes, derived rollups, the metrics table. Per-table epoch
markers already make each commit exactly-once and derived refreshes
convergent, but the COMMIT POINTS are independent: a crash (or a
reader) between two tables' commits observes epoch N in one table and
N-1 in another. TxnCatalog closes that window with the classic
WAL + roll-forward pattern built from the lake's own WAP primitives:

  stage every table's merge (`merge(stage=...)` — the data fully
  lands, nothing becomes visible)  ->  fsync ONE txn WAL record naming
  every staged commit (THE atomic point)  ->  publish each staged
  commit  ->  mark the record published.

Crash anywhere BEFORE the WAL record: nothing became visible in any
table (staged manifests are invisible and GC-pinned; a retry reuses
them by staging id — the merge work is never repeated). Crash anywhere
AFTER: `recover()` rolls every remaining publish forward (publish is
crash-idempotent through the wap_id self-heal), so all tables expose
the epoch — never some-but-not-others durably. Readers needing
cross-table consistency at a point in time read through `snapshot()`:
the per-table versions recorded by fully-published txns
(snapshot-isolation across tables — the Nessie / "catalog-level
commit" shape; reading tables directly still gives per-table
freshness).

Concurrency contract: tables written through a TxnCatalog have the
catalog as their only writer (the normal CDC topology — one
coordinator per table set; maintenance like compaction runs through or
between txns). A post-WAL publish can therefore only conflict with
this txn's own crashed attempts, which self-heal; a conflict from a
foreign writer is surfaced loudly as a contract violation rather than
silently half-committing.

Reference frame: the reference connector's per-stream POSTs commit
independently with no cross-stream transaction at all
(destination.go:384-470); Iceberg/Nessie catalog transactions are the
public pattern this reproduces on the lake's metadata layer.
"""

from __future__ import annotations

import json
import os
import re
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

from airbyte_destination_spark.lake.table import CommitConflict, LakeTable, MergeStats

_CURRENT = "CURRENT.json"


def _fsync_dir(path: str) -> None:
    fd = os.open(path, os.O_RDONLY)
    try:
        os.fsync(fd)
    finally:
        os.close(fd)


def _find_wap_version(table: LakeTable, staging_id: str) -> int:
    """Version committed by a published staging whose staged record is
    already gone (crash AFTER a publish completed): wap_id rides into
    the commit record, so walk back from LATEST. Txn publishes are by
    construction recent — the walk is O(commits since the crash)."""
    v = table.current_version()
    while v >= 1:
        try:
            rec = table._read_raw(v)
        except FileNotFoundError:
            break  # expired history: the staging predates retention
        if rec.get("wap_id") == staging_id:
            return v
        v -= 1
    raise RuntimeError(
        f"staging {staging_id!r} has neither a staged record nor a committed "
        f"version at {table.root} — the txn WAL names work that never ran"
    )


class TxnCatalog:
    """Atomic multi-table commit coordinator over LakeTable WAP staging."""

    def __init__(self, root: str):
        self.root = root
        self.txn_dir = os.path.join(root, "_txn")
        os.makedirs(self.txn_dir, exist_ok=True)

    # ------------------------------------------------------------ records

    def _rec_path(self, txn_id: str) -> str:
        if not re.fullmatch(r"[A-Za-z0-9._-]{1,128}", txn_id):
            raise ValueError(f"invalid txn id {txn_id!r}")
        return os.path.join(self.txn_dir, f"{txn_id}.json")

    def _read_rec(self, txn_id: str) -> dict | None:
        try:
            with open(self._rec_path(txn_id)) as f:
                return json.load(f)
        except FileNotFoundError:
            return None

    def _write_rec_exclusive(self, txn_id: str, rec: dict) -> None:
        """The atomic point: fsynced temp + exclusive hard link (the
        _commit discipline) — any record that exists is complete, and a
        replayed txn_id is detected instead of overwritten."""
        path = self._rec_path(txn_id)
        tmp = os.path.join(self.txn_dir, f".t.{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            json.dump(rec, f)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, path)
        except FileExistsError:
            raise CommitConflict(f"txn {txn_id!r} already recorded")
        finally:
            os.unlink(tmp)
        _fsync_dir(self.txn_dir)

    def _replace_rec(self, txn_id: str, rec: dict) -> None:
        tmp = os.path.join(self.txn_dir, f".t.{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            json.dump(rec, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._rec_path(txn_id))

    # ------------------------------------------------------------ publish

    def _roll_forward(self, rec: dict) -> dict[str, int]:
        """Publish every staged commit the WAL record names that is not
        yet published. Idempotent at every crash point: a staged record
        still present publishes (double-publish self-heals via wap_id);
        a staged record already consumed resolves to its committed
        version by the wap_id walk."""
        versions: dict[str, int] = dict(rec.get("published") or {})
        for name in sorted(rec["tables"]):
            if name in versions:
                continue
            info = rec["tables"][name]
            table = LakeTable(info["root"])
            sid = info["staging_id"]
            try:
                versions[name] = table.publish(sid)
            except FileNotFoundError:
                versions[name] = _find_wap_version(table, sid)
        rec["published"] = versions
        self._replace_rec(rec["txn_id"], rec)
        self._advance_current(rec)
        return versions

    def _advance_current(self, rec: dict) -> None:
        """Fold a fully-published txn into the catalog snapshot pointer.
        Per-table versions only move forward (max-merge), so a late
        recovery of an old txn can never regress the snapshot — the
        _recover_orphan monotonic-read lesson."""
        cur = self.snapshot(_with_roots=True)
        for name, info in rec["tables"].items():
            v = rec["published"][name]
            prev = cur.get(name)
            if prev is None or prev["version"] < v:
                cur[name] = {"root": info["root"], "version": v}
        tmp = os.path.join(self.txn_dir, f".c.{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            json.dump(cur, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, os.path.join(self.txn_dir, _CURRENT))

    def recover(self) -> int:
        """Roll forward every recorded-but-unpublished txn. Returns how
        many needed recovery. Called automatically by apply_epoch."""
        n = 0
        for fn in sorted(os.listdir(self.txn_dir)):
            if not fn.endswith(".json") or fn == _CURRENT:
                continue
            rec = self._read_rec(fn[:-5])
            if rec is not None and set(rec.get("published") or {}) != set(rec["tables"]):
                self._roll_forward(rec)
                n += 1
        return n

    # ------------------------------------------------------------ txn api

    def apply_epoch(
        self,
        txn_id: str,
        jobs: dict[str, tuple[LakeTable, DataFrame]],
        merge_kwargs: dict[str, dict] | None = None,
    ) -> dict[str, int]:
        """Apply one epoch's batches to several tables ATOMICALLY.

        `jobs`: name -> (table, change batch). Each batch merges staged
        (staging id `<txn_id>.<name>` — deterministic, so a pre-WAL
        crash retry REUSES the already-staged work instead of
        re-running Spark), then one WAL record commits them all.
        Returns name -> published version. A replayed txn_id publishes
        nothing new (exactly-once at the catalog level) and returns the
        recorded versions.
        """
        self.recover()
        rec = self._read_rec(txn_id)
        if rec is not None:  # replay: roll forward if needed, never re-merge
            return dict(rec.get("published") or self._roll_forward(rec))

        staged: dict[str, dict] = {}
        for name in sorted(jobs):
            if not re.fullmatch(r"[A-Za-z0-9_-]{1,64}", name):
                raise ValueError(f"invalid table name {name!r}")
            table, batch = jobs[name]
            sid = f"{txn_id}.{name}"
            if sid not in table.staged_ids():  # pre-WAL crash retry reuse
                kw = (merge_kwargs or {}).get(name, {})
                stats: MergeStats = table.merge(
                    batch, epoch_id=txn_id, stage=sid, **kw
                )
                assert stats.version == -1  # staged, nothing visible
            staged[name] = {"root": table.root, "staging_id": sid}

        rec = {
            "txn_id": txn_id,
            "tables": staged,
            "published": None,
            "recorded_at": time.time(),
        }
        self._write_rec_exclusive(txn_id, rec)  # THE atomic point
        return self._roll_forward(rec)

    # ------------------------------------------------------------ reads

    def snapshot(self, _with_roots: bool = False) -> dict:
        """Per-table versions of the last fully-published txns — the
        cross-table-consistent read point."""
        try:
            with open(os.path.join(self.txn_dir, _CURRENT)) as f:
                cur = json.load(f)
        except FileNotFoundError:
            cur = {}
        if _with_roots:
            return cur
        return {name: info["version"] for name, info in cur.items()}

    def read(self, spark: SparkSession, name: str) -> DataFrame:
        """Read `name` at the catalog snapshot version: two reads inside
        one snapshot never mix epochs across tables."""
        cur = self.snapshot(_with_roots=True)
        if name not in cur:
            raise KeyError(f"table {name!r} has no published txn in this catalog")
        info = cur[name]
        return LakeTable(info["root"]).read(spark, version=info["version"])
