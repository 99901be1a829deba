"""Snapshot-metadata scaling: a 10^10-event sync commits 10^4-10^5
epochs, so a commit must write O(touched buckets) metadata, not
O(table), and exactly-once markers must not accumulate forever.

These tests drive the REAL commit/reconstruct path (LakeTable._commit /
manifest()) metadata-only — no Spark jobs — so hundreds of epochs run in
milliseconds; the data path over the same machinery is covered by the
CDC end-to-end tests. The conflict tests exercise the optimistic
CommitConflict retry loop (the reference's analogue: WaitForState
polling around every mutation, destination.go:246-254 area)."""

import json
import os
import threading

import pytest
from pyspark.sql import types as T

from airbyte_destination_spark.lake import LakeTable
from airbyte_destination_spark.lake.table import (
    _CHECKPOINT_INTERVAL,
    CommitConflict,
    _fold_epochs,
)

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("tokens", T.ArrayType(T.IntegerType()), True),
        T.StructField("change_lsn", T.LongType(), False),
    ]
)
BATCH_SCHEMA = "doc_id string, tokens array<int>, change_lsn long, op string"


def _meta_table(root, n_buckets=64) -> LakeTable:
    t = LakeTable(root)
    t.create(SCHEMA, ["doc_id"], "change_lsn", n_buckets=n_buckets)
    return t


def _fake_entry(i: int, bucket: str, sid) -> dict:
    return {"path": f"data/snap-{i:08d}/_b={bucket}/part.parquet",
            "schema_id": sid, "cv": i}


def test_manifest_bytes_stay_bounded_over_250_epochs(tmp_path):
    """250 epochs on a 64-bucket table, each touching 2 buckets (with
    compaction-like steady-state file lists): per-commit record bytes
    must be O(touched), flat over time; full checkpoints must stay
    bounded because applied_epochs folds into watermarks."""
    t = _meta_table(str(tmp_path / "t"))
    shadow: dict[str, list] = {}
    shadow_at_50 = None
    sizes = {}
    for i in range(250):
        base = t.current_version()
        m = t.manifest(base)
        assert m["buckets"] == shadow, f"reconstruction diverged at v{base}"
        for bb in (str(i % 64), str((i * 7 + 3) % 64)):
            # keep the last 3 files per bucket — the auto-compacted
            # steady state a real MOR table holds
            lst = (m["buckets"].get(bb, []) + [_fake_entry(i, bb, m["schema_id"])])[-3:]
            m["buckets"][bb] = lst
            shadow = dict(shadow)
            shadow[bb] = lst
        m["operation"] = "merge"
        m["epoch_id"] = f"job-{i:06d}"
        m["lineage"] = [
            {"epoch_id": m["epoch_id"], "partition_id": i % 64,
             "lsn_min": i, "lsn_max": i, "rows_applied": 10}
        ]
        m["applied_epochs"][m["epoch_id"]] = base + 1
        v = t._commit(m, base)
        sizes[v] = os.path.getsize(t._version_path(v))
        if v == 50:
            shadow_at_50 = dict(shadow)

    # -- growth bounds ---------------------------------------------------
    deltas = {v: s for v, s in sizes.items() if v % _CHECKPOINT_INTERVAL != 0}
    ckpts = {v: s for v, s in sizes.items() if v % _CHECKPOINT_INTERVAL == 0}
    assert max(deltas.values()) < 2500, f"delta record grew: {max(deltas.values())}B"
    # late deltas must not be bigger than early ones (flat, not linear)
    early = max(s for v, s in deltas.items() if v <= 30)
    late = max(s for v, s in deltas.items() if v > 220)
    assert late <= early * 1.5, (early, late)
    # checkpoints carry every bucket's (bounded) file list but a FOLDED
    # epoch set — flat once all 64 buckets exist
    assert max(ckpts.values()) < 64 * 400 + 8000
    # flat in steady state (early checkpoints are smaller only because
    # not every bucket has files yet)
    steady = {v: s for v, s in ckpts.items() if v >= 128}
    assert max(steady.values()) <= min(steady.values()) * 1.05

    # -- exactly-once markers folded, membership exact -------------------
    m = t.manifest()
    assert m["applied_epochs"] == {}  # all contiguous -> all folded
    assert m["epoch_watermarks"] == {"job": 249}
    assert t.n_applied_epochs() == 250
    assert t.is_epoch_applied("job-000000")
    assert t.is_epoch_applied("job-000249")
    assert not t.is_epoch_applied("job-000250")
    assert not t.is_epoch_applied("other-000001")

    # -- time travel across delta chains ---------------------------------
    assert t.manifest(50)["buckets"] == shadow_at_50
    # a fresh handle (cold cache) reconstructs identically
    t2 = LakeTable(str(tmp_path / "t"))
    assert t2.manifest(50)["buckets"] == shadow_at_50
    assert t2.manifest()["buckets"] == shadow


def test_out_of_order_epochs_keep_explicit_tail_then_fold(tmp_path):
    """Epochs applied out of order stay in the explicit map until the
    gap fills, then fold into the watermark — membership is exact
    throughout (lossless pruning)."""
    t = _meta_table(str(tmp_path / "t"), n_buckets=4)
    for suffix in (0, 1, 3, 4):  # 2 missing -> watermark stops at 1
        base = t.current_version()
        m = t.manifest(base)
        m["operation"], m["epoch_id"], m["lineage"] = "merge", f"s-{suffix:03d}", []
        m["applied_epochs"][m["epoch_id"]] = base + 1
        t._commit(m, base)
    m = t.manifest()
    assert m["epoch_watermarks"] == {"s": 1}
    assert set(m["applied_epochs"]) == {"s-003", "s-004"}
    assert t.is_epoch_applied("s-003") and not t.is_epoch_applied("s-002")
    # fill the gap: everything folds
    base = t.current_version()
    m = t.manifest(base)
    m["operation"], m["epoch_id"], m["lineage"] = "merge", "s-002", []
    m["applied_epochs"]["s-002"] = base + 1
    t._commit(m, base)
    m = t.manifest()
    assert m["epoch_watermarks"] == {"s": 4} and m["applied_epochs"] == {}
    assert t.n_applied_epochs() == 5
    # non-parseable ids never fold but still count
    base = t.current_version()
    m = t.manifest(base)
    m["operation"], m["epoch_id"], m["lineage"] = "merge", "adhoc", []
    m["applied_epochs"]["adhoc"] = base + 1
    t._commit(m, base)
    assert t.is_epoch_applied("adhoc") and t.n_applied_epochs() == 6


def test_fold_epochs_unit():
    applied = {"j-000": 1, "j-001": 2, "j-002": 3, "j-007": 8, "x": 4}
    folded, wms = _fold_epochs(applied, {})
    assert wms == {"j": 2}
    assert folded == {"j-007": 8, "x": 4}
    # idempotent
    again, wms2 = _fold_epochs(folded, wms)
    assert again == folded and wms2 == wms


def test_schema_evolution_survives_delta_chain(spark, tmp_path):
    """A schema added mid-chain (delta record) must reconstruct for
    later versions and for time travel before/after the evolution."""
    t = LakeTable(str(tmp_path / "t"))
    t.create(SCHEMA, ["doc_id"], "change_lsn", n_buckets=4)
    t.merge(spark.createDataFrame([("a", [1], 1, "U")], BATCH_SCHEMA), epoch_id="e-0")
    v_before = t.current_version()
    wide = spark.createDataFrame(
        [("b", [2], 2, "U", "web")],
        "doc_id string, tokens array<int>, change_lsn long, op string, source string",
    )
    t.merge(wide, epoch_id="e-1")
    t.merge(spark.createDataFrame([("c", [3], 3, "U")], BATCH_SCHEMA), epoch_id="e-2")
    assert "source" in t.schema().fieldNames()
    m_before = t.manifest(v_before)
    before_schema = T.StructType.fromJson(
        m_before["schemas"][str(m_before["schema_id"])]
    )
    assert "source" not in before_schema.fieldNames()
    got = {r.doc_id: r.source for r in t.read(spark).collect()}
    assert got == {"a": None, "b": "web", "c": None}


# ----------------------------------------------------------------- O22


def test_commit_conflict_retry_deterministic(spark, tmp_path, monkeypatch):
    """Two writers race one table: writer B commits between writer A's
    manifest read and A's commit. A must hit CommitConflict, retry
    against the NEW base, and both batches must land — final state
    equals the serial oracle."""
    root = str(tmp_path / "t")
    a, b = LakeTable(root), LakeTable(root)
    a.create(SCHEMA, ["doc_id"], "change_lsn", n_buckets=4)

    batch_a = spark.createDataFrame(
        [("k1", [1], 10, "U"), ("k2", [2], 10, "U")], BATCH_SCHEMA
    )
    batch_b = spark.createDataFrame(
        [("k2", [9], 20, "U"), ("k3", [3], 10, "U")], BATCH_SCHEMA
    )

    real_commit = LakeTable._commit
    seen = {"conflicts": 0, "injected": False}

    def racing_commit(self, m, base):
        if self is a and not seen["injected"]:
            seen["injected"] = True
            b.merge(batch_b, epoch_id="race-b")  # steals version base+1
        try:
            return real_commit(self, m, base)
        except CommitConflict:
            seen["conflicts"] += 1
            raise

    monkeypatch.setattr(LakeTable, "_commit", racing_commit)
    stats = a.merge(batch_a, epoch_id="race-a")
    monkeypatch.setattr(LakeTable, "_commit", real_commit)

    assert seen["conflicts"] >= 1, "no CommitConflict was ever raised"
    assert stats.version == 3  # create + B's steal + A's retry
    assert a.is_epoch_applied("race-a") and a.is_epoch_applied("race-b")

    # serial oracle: same batches, no race
    o = LakeTable(str(tmp_path / "oracle"))
    o.create(SCHEMA, ["doc_id"], "change_lsn", n_buckets=4)
    o.merge(batch_b, epoch_id="race-b")
    o.merge(batch_a, epoch_id="race-a")
    got = {r.doc_id: (r.tokens, r.change_lsn) for r in a.read(spark).collect()}
    want = {r.doc_id: (r.tokens, r.change_lsn) for r in o.read(spark).collect()}
    assert got == want
    assert got["k2"] == ([9], 20)  # LWW held across the retry


def test_commit_conflict_threaded_writers(spark, tmp_path):
    """Four concurrent writers, disjoint keys, one table: every writer
    must eventually commit (retrying as needed) and the final state is
    the union — no lost update, no double-apply."""
    root = str(tmp_path / "t")
    LakeTable(root).create(SCHEMA, ["doc_id"], "change_lsn", n_buckets=4)
    errs = []

    def work(w: int):
        try:
            t = LakeTable(root)
            batch = spark.createDataFrame(
                [(f"w{w}-{i}", [w, i], 1, "U") for i in range(5)], BATCH_SCHEMA
            )
            t.merge(batch, epoch_id=f"w{w}-000")
        except Exception as e:  # noqa: BLE001
            errs.append((w, e))

    threads = [threading.Thread(target=work, args=(w,)) for w in range(4)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errs, errs
    t = LakeTable(root)
    assert t.current_version() == 5  # create + exactly one commit per writer
    rows = t.read(spark).collect()
    assert len(rows) == 20
    assert {r.doc_id for r in rows} == {f"w{w}-{i}" for w in range(4) for i in range(5)}
    for w in range(4):
        assert t.is_epoch_applied(f"w{w}-000")


def test_checkpoint_races_concurrent_writers(spark, tmp_path):
    """checkpoint() (full-manifest squash) racing four merge writers:
    everyone retries through CommitConflict, no update is lost, the
    checkpoint record is full wherever it landed, and every epoch
    marker survives the squash."""
    root = str(tmp_path / "t")
    t0 = LakeTable(root)
    t0.create(SCHEMA, ["doc_id"], "change_lsn", n_buckets=4)
    t0.merge(
        spark.createDataFrame([("seed", [0], 1, "U")], BATCH_SCHEMA),
        epoch_id="seed",
    )
    errs, ckpt_v = [], []

    def write(w: int):
        try:
            LakeTable(root).merge(
                spark.createDataFrame(
                    [(f"w{w}-{i}", [w, i], 1, "U") for i in range(5)], BATCH_SCHEMA
                ),
                epoch_id=f"w{w}-000",
            )
        except Exception as e:  # noqa: BLE001
            errs.append((w, e))

    def squash():
        try:
            ckpt_v.append(LakeTable(root).checkpoint())
        except Exception as e:  # noqa: BLE001
            errs.append(("ckpt", e))

    threads = [threading.Thread(target=write, args=(w,)) for w in range(4)]
    threads.append(threading.Thread(target=squash))
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errs, errs
    t = LakeTable(root)
    # create + seed + 4 merges + 1 checkpoint
    assert t.current_version() == 7
    assert len(ckpt_v) == 1 and not t._read_raw(ckpt_v[0]).get("delta")
    rows = t.read(spark).collect()
    assert len(rows) == 21
    for w in range(4):
        assert t.is_epoch_applied(f"w{w}-000")
    assert t.is_epoch_applied("seed")


def test_delta_records_are_actually_deltas_on_disk(spark, tmp_path):
    """Guard the format itself: a mid-interval commit record on disk
    must carry only the touched buckets, not the whole table."""
    t = LakeTable(str(tmp_path / "t"))
    t.create(SCHEMA, ["doc_id"], "change_lsn", n_buckets=8)
    t.merge(
        spark.createDataFrame(
            [(f"k{i}", [i], 1, "U") for i in range(40)], BATCH_SCHEMA
        ),
        epoch_id="e-0",
    )  # seeds ~all 8 buckets
    t.merge(spark.createDataFrame([("k1", [99], 2, "U")], BATCH_SCHEMA), epoch_id="e-1")
    with open(t._version_path(3)) as f:
        rec = json.load(f)
    assert rec.get("delta") is True
    assert "buckets" not in rec
    assert len(rec["buckets_set"]) == 1  # only k1's bucket rewritten
    # and the resolved view still sees every bucket
    assert len(t.manifest()["buckets"]) == 8
    assert t.read(spark).where("doc_id = 'k1'").collect()[0].tokens == [99]


def test_expire_snapshots_gc(spark, tmp_path):
    """Expiry retires commit records below the newest full checkpoint at
    or under (current - keep_last) and GCs unreferenced data snapshot
    dirs; retained versions — including time travel back to the
    boundary — stay fully readable."""
    t = LakeTable(str(tmp_path / "t"))
    t.create(SCHEMA, ["doc_id"], "change_lsn", n_buckets=4)
    # 70 metadata-only epochs with realistic file-list churn: every
    # commit replaces one bucket's file list (old entries unreferenced)
    for i in range(70):
        base = t.current_version()
        m = t.manifest(base)
        bb = str(i % 4)
        snap = f"snap-{base + 1:08d}-x"
        # materialize a real (empty) file so GC has something to delete
        d = tmp_path / "t" / "data" / snap / f"_b={bb}"
        d.mkdir(parents=True)
        (d / "part.parquet").write_bytes(b"")
        m["buckets"][bb] = [
            {"path": f"data/{snap}/_b={bb}/part.parquet",
             "schema_id": m["schema_id"], "cv": base + 1}
        ]
        m["operation"], m["epoch_id"], m["lineage"] = "merge", f"e-{i:06d}", []
        m["applied_epochs"][m["epoch_id"]] = base + 1
        t._commit(m, base)

    cur = t.current_version()
    before_versions = len(list((tmp_path / "t" / "_meta").glob("version-*.json")))
    before_snaps = len(list((tmp_path / "t" / "data").iterdir()))
    state_before = t.manifest()["buckets"]

    res = t.expire_snapshots(keep_last=10, grace_seconds=0)
    assert res["boundary"] == _CHECKPOINT_INTERVAL * ((cur - 10) // _CHECKPOINT_INTERVAL)
    after_versions = len(list((tmp_path / "t" / "_meta").glob("version-*.json")))
    after_snaps = len(list((tmp_path / "t" / "data").iterdir()))
    assert res["expired_versions"] == res["boundary"] - 1
    assert after_versions == before_versions - res["expired_versions"]
    assert after_snaps < before_snaps  # unreferenced snap dirs GC'd

    # current state unchanged; cold-cache handle agrees; exactly-once intact
    t2 = LakeTable(str(tmp_path / "t"))
    assert t2.manifest()["buckets"] == state_before
    assert t2.is_epoch_applied("e-000000") and t2.is_epoch_applied("e-000069")
    # time travel works at/above the boundary, raises below
    assert t2.manifest(res["boundary"]) is not None
    assert t2.manifest(res["boundary"] + 3) is not None
    with pytest.raises(FileNotFoundError):
        t2._resolved(res["boundary"] - 1)
    # every file referenced by retained versions still exists
    for files in t2.manifest()["buckets"].values():
        for e in files:
            assert (tmp_path / "t" / e["path"]).exists()
    # history() tolerates the expired prefix
    hist = t2.history()
    assert hist[0]["version"] == res["boundary"] and hist[-1]["version"] == cur


def test_fold_epochs_property():
    """Hypothesis: for ANY sequence of (prefix, suffix) applications in
    ANY order, folding preserves exact membership — every applied epoch
    tests True, every unapplied tests False — and folded size is
    bounded by the out-of-order tail."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from airbyte_destination_spark.lake.table import _epoch_applied, _fold_epochs

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(
            st.tuples(st.sampled_from(["a", "b", "c-x"]), st.integers(0, 30)),
            max_size=60,
        )
    )
    def prop(applies):
        applied, wms = {}, {}
        seen = set()
        for i, (prefix, suffix) in enumerate(applies):
            eid = f"{prefix}-{suffix:03d}"
            m = {"applied_epochs": applied, "epoch_watermarks": wms}
            if _epoch_applied(m, eid):
                assert eid in seen  # no false positives, ever
                continue
            seen.add(eid)
            applied = dict(applied)
            applied[eid] = i
            applied, wms = _fold_epochs(applied, wms)
        m = {"applied_epochs": applied, "epoch_watermarks": wms}
        for prefix, suffix in applies:
            assert _epoch_applied(m, f"{prefix}-{suffix:03d}")
        for prefix in ("a", "b", "c-x", "zzz"):
            assert not _epoch_applied(m, f"{prefix}-{31:03d}")
        # boundedness: explicit map holds only above-watermark entries
        for k in applied:
            from airbyte_destination_spark.lake.table import _split_epoch
            p, s = _split_epoch(k)
            assert s > wms.get(p, -1)

    prop()


def test_orphaned_commit_record_rolls_forward(spark, tmp_path):
    """A writer that dies between publishing its version record and
    flipping LATEST must not brick the table: the next writer rolls the
    orphan forward (its data is a real committed snapshot) and commits
    on top. Before _recover_orphan this raised CommitConflict forever."""
    import json as _json

    t = LakeTable(str(tmp_path / "t"))
    t.create(SCHEMA, ["doc_id"], "change_lsn", n_buckets=4)
    t.merge(
        spark.createDataFrame([("a", [1], 1, "U")], BATCH_SCHEMA), epoch_id="c-0"
    )
    v = t.current_version()

    # simulate the crash: publish a COMPLETE version record for v+1
    # (what _commit's atomic link guarantees) without flipping LATEST
    m = t.manifest(v)
    m["version"] = v + 1
    m["operation"], m["epoch_id"], m["lineage"] = "merge", "c-crashed", []
    m["applied_epochs"]["c-crashed"] = v + 1
    with open(t._version_path(v + 1), "x") as f:
        _json.dump(m, f)
    assert t.current_version() == v  # pointer still behind

    # next writer must succeed, landing AFTER the adopted orphan
    t2 = LakeTable(str(tmp_path / "t"))
    stats = t2.merge(
        spark.createDataFrame([("b", [2], 2, "U")], BATCH_SCHEMA), epoch_id="c-1"
    )
    assert stats.version == v + 2
    assert t2.current_version() == v + 2
    assert t2.is_epoch_applied("c-crashed")  # orphan's markers adopted
    assert t2.is_epoch_applied("c-1")
    got = {r.doc_id for r in t2.read(spark).collect()}
    assert got == {"a", "b"}


def test_changefeed_after_expiry_raises_cleanly(spark, tmp_path):
    """table_changes against an expired v_from must fail with
    FileNotFoundError (the snapshot is gone), while windows at or above
    the expiry boundary still work."""
    t = LakeTable(str(tmp_path / "t"))
    t.create(SCHEMA, ["doc_id"], "change_lsn", n_buckets=4)
    for i in range(40):
        base = t.current_version()
        m = t.manifest(base)
        m["buckets"]["0"] = [{"path": f"data/snap-{base + 1:08d}-x/_b=0/p.parquet",
                              "schema_id": m["schema_id"], "cv": base + 1}]
        d = tmp_path / "t" / "data" / f"snap-{base + 1:08d}-x" / "_b=0"
        d.mkdir(parents=True)
        (d / "p.parquet").write_bytes(b"")
        m["operation"], m["epoch_id"], m["lineage"] = "merge", f"x-{i:03d}", []
        m["applied_epochs"][m["epoch_id"]] = base + 1
        t._commit(m, base)
    res = t.expire_snapshots(keep_last=5)
    assert res["expired_versions"] > 0
    with pytest.raises(FileNotFoundError):
        t.table_changes(spark, v_from=res["boundary"] - 2)
    # at/above the boundary the manifest side still resolves
    assert t.manifest(res["boundary"]) is not None


def _churn_table(root, n_commits=40):
    """A table with n_commits merges, each replacing bucket (i%4)'s file
    list with a freshly materialized (empty) snapshot file — the churn
    pattern the GC tests need."""
    t = LakeTable(str(root))
    t.create(SCHEMA, ["doc_id"], "change_lsn", n_buckets=4)
    for i in range(n_commits):
        base = t.current_version()
        m = t.manifest(base)
        bb = str(i % 4)
        snap = f"snap-{base + 1:08d}-x"
        d = os.path.join(str(root), "data", snap, f"_b={bb}")
        os.makedirs(d)
        with open(os.path.join(d, "part.parquet"), "wb"):
            pass
        m["buckets"][bb] = [
            {"path": f"data/{snap}/_b={bb}/part.parquet",
             "schema_id": m["schema_id"], "cv": base + 1}
        ]
        m["operation"], m["epoch_id"], m["lineage"] = "merge", f"g-{i:06d}", []
        m["applied_epochs"][m["epoch_id"]] = base + 1
        t._commit(m, base)
    return t


def test_expiry_skips_inflight_higher_version_snap_dirs(tmp_path):
    """GC must never touch a snap dir whose encoded version is above the
    observed current version: merge/compact write data BEFORE the
    metadata commit, so such a dir is an in-flight write (deleting it
    would corrupt the upcoming commit). Unparseable dir names are
    skipped too."""
    t = _churn_table(tmp_path / "t")
    cur = t.current_version()
    inflight = tmp_path / "t" / "data" / f"snap-{cur + 3:08d}-inflight" / "_b=0"
    inflight.mkdir(parents=True)
    (inflight / "p.parquet").write_bytes(b"")
    weird = tmp_path / "t" / "data" / "not-a-snapshot-dir"
    weird.mkdir()

    res = t.expire_snapshots(keep_last=5, grace_seconds=0)
    assert res["deleted_files"] > 0  # old unreferenced churn IS collected
    assert inflight.is_dir()         # future-versioned dir untouched
    assert weird.is_dir()            # never delete what we can't identify


def test_expiry_grace_period_protects_recent_unreferenced_dirs(tmp_path):
    """A conflicted writer may have materialized a snapshot dir at a
    version another writer then took; until grace_seconds pass, that
    dir could still be mid-write — the default expiry must leave it."""
    t = _churn_table(tmp_path / "t")
    res = t.expire_snapshots(keep_last=5)  # default 1h grace, fresh mtimes
    assert res["deleted_files"] == 0
    assert res["expired_versions"] > 0     # metadata expiry is NOT grace-gated
    res2 = t.expire_snapshots(keep_last=5, grace_seconds=0)
    assert res2["deleted_files"] > 0


def test_tighter_then_looser_expiry_is_noop(tmp_path):
    """expire(keep_last=large) after an earlier expire(keep_last=small)
    finds no full checkpoint at or below its cutoff (those records are
    gone) and must no-op instead of crashing on the missing files."""
    t = _churn_table(tmp_path / "t")
    first = t.expire_snapshots(keep_last=5, grace_seconds=0)
    assert first["expired_versions"] > 0
    res = t.expire_snapshots(keep_last=39, grace_seconds=0)
    assert res["expired_versions"] == 0
    # and the table is still fully functional
    assert t.manifest() is not None


def test_torn_version_record_self_heals(spark, tmp_path):
    """A half-written version record (pre-fsync power-loss debris that
    no reader ever saw) must not brick the table: the next writer's
    recovery deletes it and takes the slot."""
    t = LakeTable(str(tmp_path / "t"))
    t.create(SCHEMA, ["doc_id"], "change_lsn", n_buckets=4)
    t.merge(
        spark.createDataFrame([("a", [1], 1, "U")], BATCH_SCHEMA), epoch_id="t-0"
    )
    v = t.current_version()
    with open(t._version_path(v + 1), "x") as f:
        f.write('{"version": %d, "torn' % (v + 1))  # no closing brace

    t2 = LakeTable(str(tmp_path / "t"))
    stats = t2.merge(
        spark.createDataFrame([("b", [2], 2, "U")], BATCH_SCHEMA), epoch_id="t-1"
    )
    assert stats.version == v + 1  # debris deleted, slot reused
    assert {r.doc_id for r in t2.read(spark).collect()} == {"a", "b"}


def test_recover_orphan_walks_multiple_orphans(spark, tmp_path):
    """Recovery rolls forward a CHAIN of complete-but-unpublished
    records (e.g. several crashed writers in sequence), never leaving
    LATEST pointing below an existing complete record."""
    import json as _json

    t = LakeTable(str(tmp_path / "t"))
    t.create(SCHEMA, ["doc_id"], "change_lsn", n_buckets=4)
    t.merge(
        spark.createDataFrame([("a", [1], 1, "U")], BATCH_SCHEMA), epoch_id="w-0"
    )
    v = t.current_version()
    m = t.manifest(v)  # data side unchanged; metadata-only orphans
    for k in (1, 2):
        m["version"] = v + k
        m["operation"], m["epoch_id"], m["lineage"] = "merge", f"w-crash{k}", []
        m["applied_epochs"][m["epoch_id"]] = v + k
        with open(t._version_path(v + k), "x") as f:
            _json.dump(m, f)
    assert t.current_version() == v

    t2 = LakeTable(str(tmp_path / "t"))
    t2._recover_orphan()
    assert t2.current_version() == v + 2
    assert t2.is_epoch_applied("w-crash1") and t2.is_epoch_applied("w-crash2")


def test_compaction_races_concurrent_merges(spark, tmp_path):
    """Maintenance racing ingest: a compactor thread loops while four
    writer threads land disjoint epochs on a MOR table. Both sides
    retry on CommitConflict; afterwards every epoch is applied exactly
    once and the folded state is the union — compaction never loses an
    update that committed around it."""
    root = str(tmp_path / "t")
    LakeTable(root).create(
        SCHEMA, ["doc_id"], "change_lsn", n_buckets=4, merge_strategy="mor"
    )
    errs = []
    stop = threading.Event()

    def writer(w: int):
        try:
            t = LakeTable(root)
            for e in range(3):
                batch = spark.createDataFrame(
                    [(f"w{w}-{i}", [w, e, i], e + 1, "U") for i in range(4)],
                    BATCH_SCHEMA,
                )
                t.merge(batch, epoch_id=f"w{w}-{e:03d}")
        except Exception as ex:  # noqa: BLE001
            errs.append(("writer", w, ex))

    def compactor():
        try:
            t = LakeTable(root)
            while not stop.is_set():
                t.compact(spark, min_files=2)
        except Exception as ex:  # noqa: BLE001
            errs.append(("compactor", -1, ex))

    threads = [threading.Thread(target=writer, args=(w,)) for w in range(4)]
    ct = threading.Thread(target=compactor)
    ct.start()
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    stop.set()
    ct.join()
    assert not errs, errs
    t = LakeTable(root)
    rows = {r.doc_id: r.tokens for r in t.read(spark).collect()}
    expect = {f"w{w}-{i}": [w, 2, i] for w in range(4) for i in range(4)}
    assert rows == expect
    for w in range(4):
        for e in range(3):
            assert t.is_epoch_applied(f"w{w}-{e:03d}")
