"""Sharded change-log ingestion (streaming/sharded.py): the
Kafka-partition / binlog-shard shape — K independently-ordered shards,
keys sticky to shards, per-shard offset frontier committed ATOMICALLY
with the data via multi-epoch manifest commits.

Correctness bar: final state equals the single-log replay's (the same
DuckDB-oracle-checked state test_pipeline pins), under unbalanced shard
sizes, crash-resume, replay, and racing duplicate consumers.
"""

import threading

import pytest
from pyspark.sql import functions as F

from airbyte_destination_spark.lake import LakeTable
from airbyte_destination_spark.sources.changegen import write_change_log
from airbyte_destination_spark.streaming.pipeline import IngestConfig
from airbyte_destination_spark.streaming.sharded import (
    run_ingest_sharded,
    shard_change_log,
    shard_frontier,
)
from tests.oracle import assert_equal_state

N_EVENTS, N_DOCS, N_SHARDS = 4000, 300, 4


@pytest.fixture()
def sharded_log(spark, tmp_path):
    from airbyte_destination_spark.sources.changelog import records_only

    d = str(tmp_path / "log")
    write_change_log(spark, d, N_EVENTS, N_DOCS, n_batches=1, seed=23)
    # the producer side of a sharded log ships flat change events (a
    # Kafka topic's value is one change, not an Airbyte envelope)
    log = records_only(spark.read.parquet(f"{d}/batch-*"))
    root = str(tmp_path / "shards")
    shard_change_log(spark, log, root, N_SHARDS)
    return d, root


def test_shards_are_key_sticky_and_dense(spark, sharded_log):
    _, root = sharded_log
    src = spark.read.parquet(root)
    # sticky keys: every doc_id lives in exactly one shard
    assert (
        src.groupBy("doc_id")
        .agg(F.countDistinct("shard").alias("n"))
        .where(F.col("n") > 1)
        .count()
        == 0
    )
    # dense offsets: per shard, offsets are exactly 0..count-1
    agg = src.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n"), F.min("offset").alias("lo"),
        F.max("offset").alias("hi"),
    )
    for r in agg.collect():
        assert r["lo"] == 0 and r["hi"] == r["n"] - 1
    # per-shard order preserves per-key version order
    bad = (
        src.groupBy("doc_id")
        .agg(
            F.max_by("change_lsn", "offset").alias("last_by_offset"),
            F.max("change_lsn").alias("max_lsn"),
        )
        .where(F.col("last_by_offset") != F.col("max_lsn"))
    )
    assert bad.count() == 0


def test_sharded_final_state_matches_oracle(spark, tmp_path, sharded_log):
    log_dir, root = sharded_log
    table = LakeTable(str(tmp_path / "t"))
    stats = run_ingest_sharded(
        table, spark, root, N_SHARDS, IngestConfig(n_buckets=8), window=300
    )
    assert stats.drained
    assert stats.cycles > 1  # windows force multiple cycles
    n = assert_equal_state(table.read(spark), f"{log_dir}/batch-*/*.parquet")
    assert n > 0
    # the frontier advanced atomically: every cycle's ids fold into
    # per-shard watermarks, no explicit out-of-order tail remains
    assert table.manifest().get("applied_epochs", {}) == {}


def test_sharded_equals_unsharded_engine(spark, tmp_path, sharded_log):
    """Same log through the single-stream engine and the sharded
    consumer (MOR) — identical final tables row for row."""
    log_dir, root = sharded_log
    from airbyte_destination_spark.streaming.pipeline import apply_change_batch

    cfg = IngestConfig(n_buckets=8, merge_strategy="mor")
    a = LakeTable(str(tmp_path / "a"))
    apply_change_batch(a, spark.read.parquet(f"{log_dir}/batch-*"), "all-0", cfg)
    b = LakeTable(str(tmp_path / "b"))
    run_ingest_sharded(b, spark, root, N_SHARDS, cfg, window=500)
    cols = a.read(spark).columns
    assert sorted(cols) == sorted(b.read(spark).columns)
    diff = a.read(spark).select(*cols).exceptAll(b.read(spark).select(*cols))
    assert diff.count() == 0
    assert a.read(spark).count() == b.read(spark).count()


def test_crash_resume_is_stateless_and_exactly_once(spark, tmp_path, sharded_log):
    log_dir, root = sharded_log
    table = LakeTable(str(tmp_path / "t"))
    cfg = IngestConfig(n_buckets=8)
    # "crash" after 2 cycles — consumer state is discarded entirely
    st1 = run_ingest_sharded(table, spark, root, N_SHARDS, cfg,
                             window=300, max_cycles=2)
    assert not st1.drained
    v_mid = table.current_version()
    fr_mid = shard_frontier(table, N_SHARDS)
    assert fr_mid == [2] * N_SHARDS  # both cycles committed atomically
    # a fresh consumer resumes from the manifest alone
    st2 = run_ingest_sharded(table, spark, root, N_SHARDS, cfg, window=300)
    assert st2.drained
    assert table.current_version() > v_mid
    assert set(st1.epochs).isdisjoint(st2.epochs)
    assert_equal_state(table.read(spark), f"{log_dir}/batch-*/*.parquet")
    # full replay from zero: every cycle skips, nothing changes
    v_end = table.current_version()
    st3 = run_ingest_sharded(table, spark, root, N_SHARDS, cfg, window=300)
    assert st3.rows_applied == 0
    assert table.current_version() == v_end


def test_partial_tail_window_held_back_in_live_mode(spark, tmp_path, sharded_log):
    log_dir, root = sharded_log
    table = LakeTable(str(tmp_path / "t"))
    cfg = IngestConfig(n_buckets=8)
    # window chosen so every shard ends mid-window (shard sizes ~1000)
    st_live = run_ingest_sharded(table, spark, root, N_SHARDS, cfg,
                                 window=700, final=False)
    assert not st_live.drained  # tails held back for the producer
    fr = shard_frontier(table, N_SHARDS)
    assert fr == [1] * N_SHARDS  # exactly the full windows committed
    # the drain pass consumes the tails; state converges to the oracle
    st_final = run_ingest_sharded(table, spark, root, N_SHARDS, cfg, window=700)
    assert st_final.drained
    assert_equal_state(table.read(spark), f"{log_dir}/batch-*/*.parquet")


def test_racing_duplicate_consumers_apply_each_cycle_once(
    spark, tmp_path, sharded_log
):
    """Two consumers with identical configuration race on one table
    (a misdeployed HA pair): multi-epoch commits make each cycle land
    exactly once — the loser of a commit race skips, never double-
    applies, and the final state is still the oracle's."""
    log_dir, root = sharded_log
    table = LakeTable(str(tmp_path / "t"))
    cfg = IngestConfig(n_buckets=8)
    results: dict = {}

    def consume(tag: str) -> None:
        try:
            results[tag] = run_ingest_sharded(
                table, spark, root, N_SHARDS, cfg, window=300
            )
        except Exception as e:  # surfaced below
            results[tag] = e

    ts = [threading.Thread(target=consume, args=(t,)) for t in ("a", "b")]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    for tag, r in results.items():
        assert not isinstance(r, Exception), f"consumer {tag}: {r}"
    assert_equal_state(table.read(spark), f"{log_dir}/batch-*/*.parquet")
    # every committed chunk id is unique across both consumers' applies:
    # total applied rows across the pair == the log's row count exactly
    n_log = spark.read.parquet(f"{log_dir}/batch-*").count()
    assert results["a"].rows_applied + results["b"].rows_applied == n_log


def test_partial_epoch_group_overlap_raises(spark, tmp_path, sharded_log):
    """A consumer whose chunk grouping straddles another's committed
    ids must fail loudly (silent skip loses data, re-apply duplicates)."""
    _, root = sharded_log
    from airbyte_destination_spark.streaming.pipeline import apply_change_batch

    table = LakeTable(str(tmp_path / "t"))
    cfg = IngestConfig(n_buckets=8)
    src = spark.read.parquet(root)
    w0 = src.where((F.col("offset") < 300)).drop("shard", "offset")
    apply_change_batch(table, w0, ["s0-0", "s1-0"], cfg)
    with pytest.raises(ValueError, match="PARTIALLY applied"):
        apply_change_batch(table, w0, ["s1-0", "s2-0"], cfg)
    # a full replay of the committed group skips cleanly
    st = apply_change_batch(table, w0, ["s0-0", "s1-0"], cfg)
    assert st.skipped
