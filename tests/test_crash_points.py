"""Exhaustive crash-point enumeration over the commit protocol.

The targeted crash tests (test_manifest_scaling, test_txn_catalog) pin
specific failure windows. This test makes the stronger statement: for
EVERY visibility-changing metadata syscall in a multi-epoch commit
sequence — os.link (version-record publish), os.replace (LATEST flip),
os.unlink (temp cleanup) — crash the writer immediately BEFORE the op
and immediately AFTER it, recover with a fresh handle (caches dropped,
as a restarted process would), retry the in-flight epoch, and require:

- every epoch applies EXACTLY once (the retry of a crashed-but-
  actually-committed epoch must be a metadata no-op via its marker);
- the version chain stays dense and monotone: create + one version per
  epoch, no gaps, no double commits;
- every version record along the chain parses and resolves.

Process-crash semantics only (the op either fully happened or didn't);
torn-write/power-loss recovery is covered separately by the
fsync-before-visibility reasoning in _commit and the torn-record
deletion path in _recover_orphan.
"""

import json
import os

import pytest
from pyspark.sql import types as T

from airbyte_destination_spark.lake.table import CommitConflict, LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("change_lsn", T.LongType()),
    ]
)

EPOCHS = ["e0", "e1", "e2"]


class SimulatedCrash(Exception):
    pass


class Fuse:
    """Raise SimulatedCrash at the n-th meta-dir mutation, once."""

    WRAPPED = ("link", "replace", "unlink")

    def __init__(self, meta_dir: str, n: int, mode: str):
        self.meta_dir = os.path.abspath(meta_dir)
        self.n = n
        self.mode = mode  # "before" | "after"
        self.count = 0
        self.fired = False
        self._orig = {}

    def _in_scope(self, *paths) -> bool:
        return any(
            isinstance(p, str) and os.path.abspath(p).startswith(self.meta_dir)
            for p in paths
        )

    def _wrap(self, name):
        orig = self._orig[name]

        def proxy(*args, **kwargs):
            if self.fired or not self._in_scope(*args):
                return orig(*args, **kwargs)
            self.count += 1
            if self.count == self.n:
                self.fired = True
                if self.mode == "before":
                    raise SimulatedCrash(f"{name} #{self.n} (before)")
                out = orig(*args, **kwargs)
                raise SimulatedCrash(f"{name} #{self.n} (after)")
            return orig(*args, **kwargs)

        return proxy

    def __enter__(self):
        for name in self.WRAPPED:
            self._orig[name] = getattr(os, name)
            setattr(os, name, self._wrap(name))
        return self

    def __exit__(self, *exc):
        for name, fn in self._orig.items():
            setattr(os, name, fn)
        return False


def _commit_epoch(t: LakeTable, epoch_id: str) -> str:
    """The minimal metadata-level analog of a merge's commit loop."""
    for _ in range(20):
        t._recover_orphan()
        base = t.current_version()
        if t.is_epoch_applied(epoch_id):
            return "skipped"
        m = t.manifest(base)
        m["operation"] = "merge"
        m["epoch_id"] = epoch_id
        m["lineage"] = []
        m["applied_epochs"] = {**m["applied_epochs"], epoch_id: base + 1}
        try:
            t._commit(m, base)
            return "applied"
        except CommitConflict:
            continue
    raise RuntimeError("commit loop did not converge")


def _run(root: str, n: int, mode: str) -> tuple[bool, LakeTable]:
    """Create a table and drive EPOCHS with the fuse armed from the
    first epoch. Returns (fired, recovered_handle)."""
    t = LakeTable(root)
    t.create(SCHEMA, ["doc_id"], "change_lsn", n_buckets=4)
    fuse = Fuse(t.meta_dir, n, mode)
    with fuse:
        for e in EPOCHS:
            while True:
                try:
                    _commit_epoch(t, e)
                    break
                except SimulatedCrash:
                    t = LakeTable(root)  # restarted process: fresh caches
    return fuse.fired, LakeTable(root)


@pytest.mark.parametrize("mode", ["before", "after"])
def test_every_crash_point_recovers_exactly_once(tmp_path, mode):
    n = 1
    covered = 0
    while True:
        root = str(tmp_path / f"{mode}-{n}")
        fired, t = _run(root, n, mode)
        v = t.current_version()
        assert v == 1 + len(EPOCHS), f"fuse {n} ({mode}): version chain {v}"
        for i, e in enumerate(EPOCHS):
            assert t.is_epoch_applied(e), f"fuse {n} ({mode}): {e} lost"
            # exactly-once: the marker binds each epoch to one version
            assert t.manifest(v)["applied_epochs"][e] == 2 + i
        for ver in range(1, v + 1):  # every record parses and resolves
            assert t.manifest(ver)["version"] == ver
        # no stray version record above LATEST survived recovery un-adopted
        assert not os.path.exists(t._version_path(v + 1))
        if not fired:
            break  # fuse exceeded the run's total mutations: full coverage
        covered += 1
        n += 1
    # sanity: the enumeration actually exercised a healthy spread of
    # crash points (3 wrapped syscalls x several commits)
    assert covered >= 8, covered


def test_crash_after_publish_is_a_replay_noop(tmp_path):
    """The sharpest point: the version record is linked (commit IS
    durable) but the writer dies before flipping LATEST. The retry
    must adopt the orphan and skip, not double-apply."""
    root = str(tmp_path / "t")
    t = LakeTable(root)
    t.create(SCHEMA, ["doc_id"], "change_lsn", n_buckets=4)
    # fuse 1 "after" = crash right after the first meta-dir mutation of
    # epoch e0's commit, which is the os.link publishing version 2
    fuse = Fuse(t.meta_dir, 1, "after")
    with fuse:
        with pytest.raises(SimulatedCrash):
            _commit_epoch(t, "e0")
    t2 = LakeTable(root)
    assert _commit_epoch(t2, "e0") == "skipped"  # adopted, not re-applied
    assert t2.current_version() == 2
    assert t2.manifest(2)["applied_epochs"]["e0"] == 2


def _stage_and_publish(t: LakeTable, sid: str) -> int:
    """The idempotent WAP driver a restarted job would run: re-stage
    only if the staged record is gone AND the commit never landed."""
    if not os.path.exists(t._staged_path(sid)):
        for v in range(1, t.current_version() + 1):
            if t._read_raw(v).get("wap_id") == sid:
                return v  # published and cleaned up before the crash
        base = t.current_version()
        m = t.manifest(base)
        m["operation"] = "merge"
        m["epoch_id"] = None
        m["lineage"] = []
        t._write_staged(sid, m, base)
    return t.publish(sid)


@pytest.mark.parametrize("mode", ["before", "after"])
def test_every_wap_crash_point_publishes_exactly_once(tmp_path, mode):
    """Same enumeration over the stage -> publish sequence: staged
    record link/cleanup, commit publish, LATEST flip, staged unlink."""
    n = 1
    covered = 0
    while True:
        root = str(tmp_path / f"wap-{mode}-{n}")
        t = LakeTable(root)
        t.create(SCHEMA, ["doc_id"], "change_lsn", n_buckets=4)
        fuse = Fuse(t.meta_dir, n, mode)
        with fuse:
            while True:
                try:
                    v = _stage_and_publish(t, "wap-1")
                    break
                except SimulatedCrash:
                    t = LakeTable(root)
        assert v == 2, f"fuse {n} ({mode}): published at {v}"
        t2 = LakeTable(root)
        assert t2.current_version() == 2
        assert t2._read_raw(2).get("wap_id") == "wap-1"
        assert t2.staged_ids() == []  # cleanup finished or never needed
        # replaying the whole driver is a no-op returning the version
        assert _stage_and_publish(t2, "wap-1") == 2
        assert t2.current_version() == 2
        if not fuse.fired:
            break
        covered += 1
        n += 1
    assert covered >= 4, covered
