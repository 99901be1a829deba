"""Evolution x concurrency cross-coverage (round-5 verdict task 5).

Round 4 added column rename/default/drop evolution AND two big
concurrency features — sharded multi-epoch ingest (O23) and
catalog-level multi-table txn commits. Each is oracled alone; these
tests drive them AGAINST each other: metadata-only evolution commits
landing mid-ingest must not disturb the shard frontier (derived from
epoch watermarks), must stay invisible to exactly-once replay
protection, and a txn epoch spanning base + rollup must stay atomic
and consistent across an evolution of the base between epochs.
"""

import pytest
from pyspark.sql import types as T

from airbyte_destination_spark.lake import LakeTable
from airbyte_destination_spark.lake.txn_catalog import TxnCatalog
from airbyte_destination_spark.sources.changegen import write_change_log
from airbyte_destination_spark.sources.changelog import records_only
from airbyte_destination_spark.streaming.pipeline import IngestConfig
from airbyte_destination_spark.streaming.sharded import (
    run_ingest_sharded,
    shard_change_log,
    shard_frontier,
)
from tests.oracle import assert_equal_state

N_EVENTS, N_DOCS, N_SHARDS = 4000, 300, 4


def test_evolution_churn_mid_sharded_ingest(spark, tmp_path):
    """rename + drop/re-add + checkpoint landing BETWEEN sharded ingest
    cycles: the frontier (derived from epoch watermarks riding the
    manifest) must resume exactly where the data commits left it — the
    metadata-only commits carry epoch_id=None and no watermarks of
    their own — and the drained state must equal the single-log oracle,
    with the evolved column serving its default on every pre-existing
    row."""
    d = str(tmp_path / "log")
    write_change_log(spark, d, N_EVENTS, N_DOCS, n_batches=1, seed=29)
    log = records_only(spark.read.parquet(f"{d}/batch-*"))
    root = str(tmp_path / "shards")
    shard_change_log(spark, log, root, N_SHARDS)

    table = LakeTable(str(tmp_path / "t"))
    cfg = IngestConfig(n_buckets=8, merge_strategy="mor")
    st1 = run_ingest_sharded(table, spark, root, N_SHARDS, cfg,
                             window=300, max_cycles=2)
    assert not st1.drained
    fr_mid = shard_frontier(table, N_SHARDS)
    assert fr_mid == [2] * N_SHARDS

    # evolution churn mid-ingest: add -> rename -> drop -> re-add,
    # plus a manifest checkpoint — five metadata-only commits
    table.add_column("quality", T.DoubleType(), initial_default=0.5)
    table.rename_column("quality", "q_score")
    table.drop_column("q_score")
    table.add_column("q_score", T.DoubleType(), initial_default=0.9)
    table.checkpoint()

    # the frontier is untouched by the metadata tail
    assert shard_frontier(table, N_SHARDS) == fr_mid

    # a fresh consumer drains; resume is derived from the manifest alone
    st2 = run_ingest_sharded(table, spark, root, N_SHARDS, cfg, window=300)
    assert st2.drained
    assert set(st1.epochs).isdisjoint(st2.epochs)
    assert_equal_state(table.read(spark), f"{d}/batch-*/*.parquet")
    # rows last written BEFORE the re-add serve its initial default;
    # rows ingested after it read what was written (NULL — the batch
    # never carried the column, Iceberg v3 default semantics). The
    # dropped prior life's 0.5 must never appear anywhere.
    q = {r.doc_id: r.q_score for r in table.read(spark).collect()}
    vals = set(q.values())
    assert vals <= {0.9, None} and 0.5 not in vals
    assert 0.9 in vals  # pre-evolution rows do read the default
    assert "quality" not in table.read(spark).columns

    # full replay from zero: all cycles skip across the evolution
    v_end = table.current_version()
    st3 = run_ingest_sharded(table, spark, root, N_SHARDS, cfg, window=300)
    assert st3.rows_applied == 0 and table.current_version() == v_end


SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType(), False),
        T.StructField("v", T.LongType(), True),
        T.StructField("ver", T.LongType(), False),
    ]
)
BATCH = "k string, v long, ver long, op string"


def test_txn_epoch_spanning_base_evolution(spark, tmp_path):
    """A TxnCatalog multi-table epoch before AND after an evolution of
    the base table (rename + drop/re-add): epochs stay atomic, the
    snapshot never mixes, a replayed pre-evolution epoch is still a
    no-op, and base/rollup agree on the post-evolution state."""
    base = LakeTable(str(tmp_path / "base"))
    base.create(
        T.StructType(
            SCHEMA.fields + [T.StructField("tag", T.StringType(), True)]
        ),
        ["k"], "ver", n_buckets=4,
    )
    roll = LakeTable(str(tmp_path / "roll"))
    roll.create(SCHEMA, ["k"], "ver", n_buckets=4)
    cat = TxnCatalog(str(tmp_path / "cat"))

    b1 = spark.createDataFrame(
        [("a", 1, 1, "old", "I"), ("b", 2, 2, "old", "I")],
        "k string, v long, ver long, tag string, op string",
    )
    r1 = spark.createDataFrame([("day1", 3, 1, "I")], BATCH)
    v1 = cat.apply_epoch("e1", {"base": (base, b1), "roll": (roll, r1)})
    assert set(v1) == {"base", "roll"}

    # evolve the base between txn epochs
    base.rename_column("tag", "label")
    base.drop_column("label")
    base.add_column("label", T.StringType(), initial_default="und")

    b2 = spark.createDataFrame(
        [("a", 10, 3, "new", "U")],
        "k string, v long, ver long, label string, op string",
    )
    r2 = spark.createDataFrame([("day1", 13, 2, "U")], BATCH)
    v2 = cat.apply_epoch("e2", {"base": (base, b2), "roll": (roll, r2)})
    snap = cat.snapshot()
    assert snap == v2 and snap["base"] > v1["base"]

    got = {r.k: (r.v, r.label) for r in base.read(spark).collect()}
    # pre-evolution rows serve the re-add default; the dropped prior
    # life ("old" under tag/label) never resurfaces
    assert got == {"a": (10, "new"), "b": (2, "und")}
    assert {r.k: r.v for r in roll.read(spark).collect()} == {"day1": 13}

    # replaying the PRE-evolution epoch across the evolved manifest is
    # still an exact no-op for every table in the txn
    before = (base.current_version(), roll.current_version())
    cat.apply_epoch("e1", {"base": (base, b1), "roll": (roll, r1)})
    assert (base.current_version(), roll.current_version()) == before
    assert {r.k: (r.v, r.label) for r in base.read(spark).collect()} == got


def test_wap_publish_conflicts_with_interleaved_evolution(spark, tmp_path):
    """A schema evolution landing between a WAP stage and its publish
    must follow the WAP retry discipline: publish raises
    CommitConflict (the staged rewrite was computed against a manifest
    that no longer exists), abort leaves zero residue, and the
    re-stage merges cleanly against the evolved schema — with the
    dropped column's prior life never resurfacing through the staged
    read or the published state."""
    from airbyte_destination_spark.lake import LakeTable
    from airbyte_destination_spark.lake.table import CommitConflict

    t = LakeTable(str(tmp_path / "t"))
    t.create(
        T.StructType(
            [
                T.StructField("doc_id", T.StringType(), False),
                T.StructField("change_lsn", T.LongType(), False),
                T.StructField("lang", T.StringType(), True),
            ]
        ),
        ["doc_id"], "change_lsn", n_buckets=2, merge_strategy="mor",
    )
    S = "doc_id string, change_lsn long, lang string, op string"
    t.merge(spark.createDataFrame([("a", 1, "STALE", "I")], S), epoch_id="w0")
    t.merge(
        spark.createDataFrame([("b", 2, "fr", "I")], S),
        epoch_id="w1", stage="release-x",
    )
    # evolution races in between stage and publish
    t.drop_column("lang")
    t.add_column("lang", T.StringType(), initial_default="und")
    t.rename_column("lang", "language")

    import pytest as _pytest

    with _pytest.raises(CommitConflict):
        t.publish("release-x")
    t.abort("release-x")
    assert t.staged_ids() == []
    assert not t.is_epoch_applied("w1")

    # re-stage against the evolved schema, then publish
    t.merge(
        spark.createDataFrame(
            [("b", 2, "fr", "I")],
            "doc_id string, change_lsn long, language string, op string",
        ),
        epoch_id="w1", stage="release-x2",
    )
    staged = {r.doc_id: r.language for r in t.read_staged(spark, "release-x2").collect()}
    assert staged == {"a": "und", "b": "fr"}  # no STALE anywhere
    t.publish("release-x2")
    got = {r.doc_id: r.language for r in t.read(spark).collect()}
    assert got == {"a": "und", "b": "fr"}
