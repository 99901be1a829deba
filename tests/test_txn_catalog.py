"""Catalog-level atomic multi-table commits (lake/txn_catalog.py).

The contract under test: a txn's tables become visible all-or-nothing —
crash before the WAL record publishes NOTHING (and a retry reuses the
staged work), crash after it rolls EVERYTHING forward; `snapshot()`
reads never mix epochs across tables; a replayed txn id is a no-op.
"""

import pytest
from pyspark.sql import types as T

from airbyte_destination_spark.lake import LakeTable
from airbyte_destination_spark.lake.txn_catalog import TxnCatalog

SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType(), False),
        T.StructField("v", T.LongType(), True),
        T.StructField("ver", T.LongType(), False),
    ]
)
BATCH = "k string, v long, ver long, op string"


@pytest.fixture()
def env(spark, tmp_path):
    base = LakeTable(str(tmp_path / "base"))
    base.create(SCHEMA, ["k"], "ver", n_buckets=4)
    roll = LakeTable(str(tmp_path / "roll"))
    roll.create(SCHEMA, ["k"], "ver", n_buckets=4)
    cat = TxnCatalog(str(tmp_path / "cat"))
    return cat, base, roll


def _b(spark, rows):
    return spark.createDataFrame(rows, BATCH)


def _state(spark, df):
    return sorted((r.k, r.v, r.ver) for r in df.collect())


def test_atomic_epochs_and_snapshot_reads(spark, env):
    cat, base, roll = env
    v1 = cat.apply_epoch(
        "e1",
        {
            "base": (base, _b(spark, [("a", 1, 1, "I"), ("b", 2, 2, "I")])),
            "roll": (roll, _b(spark, [("day1", 3, 1, "I")])),
        },
    )
    assert set(v1) == {"base", "roll"}
    assert cat.snapshot() == v1
    v2 = cat.apply_epoch(
        "e2",
        {
            "base": (base, _b(spark, [("a", 10, 3, "U"), ("b", 0, 4, "D")])),
            "roll": (roll, _b(spark, [("day1", 13, 2, "U")])),
        },
    )
    assert v2["base"] > v1["base"] and v2["roll"] > v1["roll"]
    assert _state(spark, cat.read(spark, "base")) == [("a", 10, 3)]
    assert _state(spark, cat.read(spark, "roll")) == [("day1", 13, 2)]
    # replayed txn id: nothing re-merges, versions unchanged
    v2b = cat.apply_epoch(
        "e2",
        {
            "base": (base, _b(spark, [("x", 99, 99, "I")])),
            "roll": (roll, _b(spark, [("x", 99, 99, "I")])),
        },
    )
    assert v2b == v2
    assert base.current_version() == v2["base"]
    assert _state(spark, cat.read(spark, "base")) == [("a", 10, 3)]


def test_pre_wal_crash_retry_reuses_staged_work(spark, env):
    cat, base, roll = env
    # "crash" after staging one table but before the WAL record
    base.merge(_b(spark, [("a", 1, 1, "I")]), epoch_id="e1", stage="e1.base")
    assert base.current_version() == 1  # nothing visible
    v = cat.apply_epoch(
        "e1",
        {
            "base": (base, _b(spark, [("a", 1, 1, "I")])),
            "roll": (roll, _b(spark, [("d", 1, 1, "I")])),
        },
    )
    assert _state(spark, cat.read(spark, "base")) == [("a", 1, 1)]
    assert _state(spark, cat.read(spark, "roll")) == [("d", 1, 1)]
    assert base.staged_ids() == [] and roll.staged_ids() == []
    assert set(v) == {"base", "roll"}


def test_post_wal_crash_rolls_forward_and_snapshot_never_tears(spark, env):
    cat, base, roll = env
    cat.apply_epoch(
        "e1",
        {
            "base": (base, _b(spark, [("a", 1, 1, "I")])),
            "roll": (roll, _b(spark, [("d", 1, 1, "I")])),
        },
    )
    snap1 = cat.snapshot()

    # epoch 2: stage both, write the WAL record, publish ONLY base —
    # then "crash" (no mark, no CURRENT advance)
    base.merge(_b(spark, [("a", 2, 2, "U")]), epoch_id="e2", stage="e2.base")
    roll.merge(_b(spark, [("d", 2, 2, "U")]), epoch_id="e2", stage="e2.roll")
    rec = {
        "txn_id": "e2",
        "tables": {
            "base": {"root": base.root, "staging_id": "e2.base"},
            "roll": {"root": roll.root, "staging_id": "e2.roll"},
        },
        "published": None,
        "recorded_at": 0.0,
    }
    cat._write_rec_exclusive("e2", rec)
    base.publish("e2.base")

    # the torn window: base's LATEST moved, roll's didn't — but the
    # catalog snapshot still serves the consistent epoch-1 pair
    assert cat.snapshot() == snap1
    assert _state(spark, cat.read(spark, "base")) == [("a", 1, 1)]

    # recovery rolls the remaining publish forward: base resolves its
    # consumed staging via the wap walk, roll publishes normally
    assert cat.recover() == 1
    snap2 = cat.snapshot()
    assert snap2["base"] > snap1["base"] and snap2["roll"] > snap1["roll"]
    assert _state(spark, cat.read(spark, "base")) == [("a", 2, 2)]
    assert _state(spark, cat.read(spark, "roll")) == [("d", 2, 2)]
    # recovery is itself idempotent
    assert cat.recover() == 0


def test_apply_epoch_recovers_before_new_work(spark, env):
    """A new epoch arriving after a crashed one first rolls the crashed
    txn forward — ordering across txns is preserved."""
    cat, base, roll = env
    base.merge(_b(spark, [("a", 1, 1, "I")]), epoch_id="e1", stage="e1.base")
    roll.merge(_b(spark, [("d", 1, 1, "I")]), epoch_id="e1", stage="e1.roll")
    cat._write_rec_exclusive(
        "e1",
        {
            "txn_id": "e1",
            "tables": {
                "base": {"root": base.root, "staging_id": "e1.base"},
                "roll": {"root": roll.root, "staging_id": "e1.roll"},
            },
            "published": None,
            "recorded_at": 0.0,
        },
    )
    v2 = cat.apply_epoch(
        "e2",
        {
            "base": (base, _b(spark, [("a", 2, 2, "U")])),
            "roll": (roll, _b(spark, [("d", 2, 2, "U")])),
        },
    )
    assert _state(spark, cat.read(spark, "base")) == [("a", 2, 2)]
    assert cat.snapshot() == v2
