"""snapshot_sync: full-resync via snapshot diff (streaming/pipeline.py).

The MERGE ... WHEN NOT MATCHED BY SOURCE THEN DELETE / Debezium
initial-snapshot operation: compute the minimal I/U/D batch that moves
the table to a given snapshot and apply it through the normal
exactly-once merge path.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from airbyte_destination_spark.lake import LakeTable
from airbyte_destination_spark.streaming.pipeline import (
    IngestConfig,
    apply_change_batch,
    snapshot_sync,
)

CFG = IngestConfig(key_cols=["doc_id"], n_buckets=4)

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("change_lsn", T.LongType(), False),
        T.StructField("kind", T.StringType(), True),
        T.StructField("score", T.DoubleType(), True),
    ]
)


def _seed(spark, tmp_path, strategy="cow"):
    """Table with keys 1..8, values kind=k<i>, score=i*1.0, lsn=i."""
    table = LakeTable(str(tmp_path / "t"))
    table.create(SCHEMA, ["doc_id"], "change_lsn", n_buckets=4, merge_strategy=strategy)
    rows = [(i, i, f"k{i}", float(i)) for i in range(1, 9)]
    batch = spark.createDataFrame(rows, SCHEMA).withColumn("op", F.lit("U"))
    apply_change_batch(table, batch, "seed-0", CFG)
    return table


def _snap(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _state(spark, table):
    return {
        r["doc_id"]: (r["kind"], r["score"])
        for r in table.read(spark).collect()
    }


@pytest.mark.parametrize("strategy", ["cow", "mor"])
def test_sync_applies_minimal_diff(spark, tmp_path, strategy):
    table = _seed(spark, tmp_path, strategy)
    # snapshot: key 1 gone (delete), key 3 changed (update, later lsn),
    # key 9 new (insert), keys 2,4..8 unchanged (same values, and must
    # NOT be rewritten)
    rows = [(i, i, f"k{i}", float(i)) for i in range(2, 9) if i != 3]
    rows += [(3, 10, "k3x", 3.5), (9, 11, "k9", 9.0)]
    stats = snapshot_sync(table, _snap(spark, rows), "resync-0", CFG)
    assert not stats.skipped
    # O(diff): only 3 change rows (2 upserts + 1 delete) crossed the
    # merge, not the 8-row table (rows_upserted counts records RECEIVED,
    # the reference's destinationStats semantics — deletes included)
    assert stats.rows_upserted == 3
    assert _state(spark, table) == {
        i: (f"k{i}", float(i)) for i in range(2, 9) if i != 3
    } | {3: ("k3x", 3.5), 9: ("k9", 9.0)}
    # unchanged rows kept their stored lsn (they never entered the diff)
    lsns = {r["doc_id"]: r["change_lsn"] for r in table.read(spark).collect()}
    assert lsns[2] == 2 and lsns[3] == 10 and lsns[9] == 11

    # replayed epoch no-ops before paying the diff join
    again = snapshot_sync(table, _snap(spark, rows), "resync-0", CFG)
    assert again.skipped

    # re-sync of the now-identical snapshot = empty diff, zero writes
    v0 = table.current_version()
    empty = snapshot_sync(table, _snap(spark, rows), "resync-1", CFG)
    assert empty.rows_upserted == 0
    assert _state(spark, table)[3] == ("k3x", 3.5)
    assert table.current_version() >= v0  # epoch recorded, state unchanged


def test_sync_never_regresses_newer_rows(spark, tmp_path):
    """A table row AHEAD of the snapshot (higher lsn) survives: LWW
    orders the resync against live changes instead of clobbering."""
    table = _seed(spark, tmp_path)
    live = _snap(spark, [(5, 100, "live", 55.0)]).withColumn("op", F.lit("U"))
    apply_change_batch(table, live, "live-0", CFG)
    # stale snapshot still carries key 5's old image at lsn 5
    rows = [(i, i, f"k{i}", float(i)) for i in range(1, 9)]
    snapshot_sync(table, _snap(spark, rows), "resync-0", CFG)
    assert _state(spark, table)[5] == ("live", 55.0)


def test_sync_bootstraps_missing_table(spark, tmp_path):
    table = LakeTable(str(tmp_path / "t"))
    rows = [(i, i, f"k{i}", float(i)) for i in range(1, 5)]
    stats = snapshot_sync(table, _snap(spark, rows), "boot-0", CFG)
    assert stats.rows_upserted == 4
    assert _state(spark, table) == {i: (f"k{i}", float(i)) for i in range(1, 5)}


def test_sync_evolves_schema(spark, tmp_path):
    """Snapshot-added column: current side reads as NULL, so rows whose
    only change is the new column are detected and updated (their
    snapshot lsn must be advanced, as a later-taken snapshot's is)."""
    table = _seed(spark, tmp_path)
    ev = T.StructType([*SCHEMA.fields, T.StructField("extra", T.StringType(), True)])
    rows = [(i, 20 + i, f"k{i}", float(i), f"x{i}") for i in range(1, 9)]
    stats = snapshot_sync(table, spark.createDataFrame(rows, ev), "resync-0", CFG)
    assert stats.rows_upserted == 8  # every row gained `extra`
    got = {r["doc_id"]: r["extra"] for r in table.read(spark).collect()}
    assert got == {i: f"x{i}" for i in range(1, 9)}


def test_sync_requires_version_column(spark, tmp_path):
    table = _seed(spark, tmp_path)
    snap = _snap(spark, [(1, 1, "k1", 1.0)]).drop("change_lsn")
    with pytest.raises(ValueError, match="version column"):
        snapshot_sync(table, snap, "resync-0", CFG)
