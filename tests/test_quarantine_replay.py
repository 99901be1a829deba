"""Dead-letter repair-and-replay (streaming/pipeline.replay_quarantine):
quarantined rows re-enter through the same exactly-once apply path,
keep their original LSNs (a repaired old version never overwrites a
newer live one), still-bad rows re-quarantine under a derived epoch,
and sweeps are idempotent across crashes of the consumption marker.
"""

import os

from pyspark.sql import functions as F

from airbyte_destination_spark.lake import LakeTable
from airbyte_destination_spark.streaming.pipeline import (
    IngestConfig,
    apply_change_batch,
    replay_quarantine,
)

SCHEMA = "doc_key long, change_lsn long, op string, tokens array<int>, n_tok int"


def _cfg(tmp_path):
    return IngestConfig(
        key_cols=["doc_key"],
        version_col="change_lsn",
        n_buckets=4,
        quarantine_root=str(tmp_path / "q"),
    )


def _repair(df):
    # the canonical writer-bug fix: recompute n_tok from the payload;
    # null-token rows keep their stored n_tok (nothing to recompute
    # from) and re-quarantine as tokens_null
    return df.withColumn(
        "n_tok", F.coalesce(F.size("tokens"), F.col("n_tok"))
    )


def test_repair_and_replay_lww_and_requeue(spark, tmp_path):
    table = LakeTable(str(tmp_path / "t"))
    cfg = _cfg(tmp_path)
    batch = spark.createDataFrame(
        [
            (1, 10, "U", [1, 2, 3], 3),  # good
            (2, 11, "U", [4, 5], 3),  # n_tok mismatch -> repairable
            (3, 12, "U", None, 2),  # tokens null -> unrepairable
            (1, 13, "U", [7], 1),  # good, newer version of key 1
        ],
        SCHEMA,
    )
    s0 = apply_change_batch(table, batch, "e0", cfg)
    assert s0.rows_quarantined == 2
    assert {r["doc_key"] for r in table.read(spark).collect()} == {1}

    # a LIVE update for key 2 lands BEFORE the replay, with a newer lsn:
    # the repaired lsn-11 row must lose last-writer-wins to it
    apply_change_batch(
        table,
        spark.createDataFrame([(2, 20, "U", [9, 9], 2)], SCHEMA),
        "e1",
        cfg,
    )

    swept = replay_quarantine(table, spark, cfg, _repair)
    assert list(swept) == ["e0.qreplay"]
    assert swept["e0.qreplay"].rows_quarantined == 1  # key 3 re-queued

    final = {r["doc_key"]: r for r in table.read(spark).collect()}
    assert set(final) == {1, 2}
    assert final[1]["change_lsn"] == 13 and final[1]["tokens"] == [7]
    # repaired old version did NOT overwrite the newer live row
    assert final[2]["change_lsn"] == 20 and final[2]["tokens"] == [9, 9]

    # the re-queued row sits under the derived epoch dir, unconsumed
    dirs = sorted(os.listdir(cfg.quarantine_root))
    assert dirs == ["epoch=e0", "epoch=e0.qreplay"]
    assert os.path.exists(
        os.path.join(cfg.quarantine_root, "epoch=e0", "_REPLAYED")
    )


def test_sweep_is_idempotent_and_crash_safe(spark, tmp_path):
    table = LakeTable(str(tmp_path / "t"))
    cfg = _cfg(tmp_path)
    apply_change_batch(
        table,
        spark.createDataFrame([(5, 1, "U", [1], 2), (6, 2, "U", [2], 1)], SCHEMA),
        "e0",
        cfg,
    )
    swept = replay_quarantine(table, spark, cfg, _repair)
    assert swept["e0.qreplay"].rows_upserted == 1
    assert {r["doc_key"] for r in table.read(spark).collect()} == {5, 6}

    # marked dir -> second sweep is a no-op
    assert replay_quarantine(table, spark, cfg, _repair) == {}

    # crash between merge commit and marker: remove the marker and
    # sweep again — the epoch marker makes the merge a no-op and the
    # marker is rewritten (exactly once either way)
    marker = os.path.join(cfg.quarantine_root, "epoch=e0", "_REPLAYED")
    os.unlink(marker)
    swept2 = replay_quarantine(table, spark, cfg, _repair)
    assert swept2["e0.qreplay"].skipped
    assert os.path.exists(marker)
    assert {r["doc_key"] for r in table.read(spark).collect()} == {5, 6}


def test_second_repair_attempt_after_better_fix(spark, tmp_path):
    table = LakeTable(str(tmp_path / "t"))
    cfg = _cfg(tmp_path)
    apply_change_batch(
        table,
        spark.createDataFrame([(7, 1, "U", None, 3)], SCHEMA),
        "e0",
        cfg,
    )
    # first sweep: n_tok repair can't fix a null payload -> re-queued
    swept = replay_quarantine(table, spark, cfg, _repair)
    assert swept["e0.qreplay"].rows_quarantined == 1
    assert table.read(spark).count() == 0

    # second sweep with a better fix (reconstruct the payload) finds
    # the row under the DERIVED epoch and lands it
    def fix(df):
        return df.withColumn(
            "tokens",
            F.coalesce(
                F.col("tokens"),
                F.array_repeat(F.lit(0), F.col("n_tok")),
            ),
        )

    swept2 = replay_quarantine(table, spark, cfg, fix)
    assert list(swept2) == ["e0.qreplay.qreplay"]
    assert swept2["e0.qreplay.qreplay"].rows_quarantined == 0
    row = table.read(spark).collect()[0]
    assert row["doc_key"] == 7 and row["tokens"] == [0, 0, 0]


def test_replay_lands_across_schema_evolution(spark, tmp_path):
    """A row quarantined under the OLD schema replays cleanly after the
    table evolved (new column added by a later live batch): the merge's
    schema-merge fills the missing column with NULL for the repaired
    row — dead letters don't pin the schema."""
    table = LakeTable(str(tmp_path / "t"))
    cfg = _cfg(tmp_path)
    apply_change_batch(
        table,
        spark.createDataFrame([(1, 10, "U", [1, 2], 9)], SCHEMA),  # bad n_tok
        "e0",
        cfg,
    )
    assert table.read(spark).count() == 0
    # live batch under an EVOLVED schema (adds `source`)
    evolved = spark.createDataFrame(
        [(2, 20, "U", [3], 1, "web")],
        SCHEMA + ", source string",
    )
    apply_change_batch(table, evolved, "e1", cfg)
    assert "source" in table.read(spark).columns

    swept = replay_quarantine(table, spark, cfg, _repair)
    assert swept["e0.qreplay"].rows_quarantined == 0
    final = {r["doc_key"]: r for r in table.read(spark).collect()}
    assert final[1]["tokens"] == [1, 2] and final[1]["n_tok"] == 2
    assert final[1]["source"] is None and final[2]["source"] == "web"
