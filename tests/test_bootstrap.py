"""Chunked incremental-snapshot bootstrap (streaming/bootstrap.py).

The DBLog / Debezium-incremental-snapshot scenario: the change log has
been trimmed by retention, so the table must be stood up from chunked
source reads interleaved with the surviving log tail. Final state must
equal full-history LWW replay — including keys whose entire history
was trimmed (recovered from chunks alone) and keys deleted before the
horizon (must stay absent).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from airbyte_destination_spark.lake import LakeTable
from airbyte_destination_spark.streaming.bootstrap import (
    bootstrap_ingest,
    log_prefix_chunk_reader,
)
from airbyte_destination_spark.streaming.pipeline import IngestConfig, apply_change_batch

CFG = IngestConfig(key_cols=["doc_key"], n_buckets=4)

SCHEMA = T.StructType(
    [
        T.StructField("doc_key", T.LongType(), False),
        T.StructField("change_lsn", T.LongType(), False),
        T.StructField("op", T.StringType(), False),
        T.StructField("value", T.DoubleType(), True),
    ]
)

# lsn:      1   2   3   4   5 | 6   7   8   9   10        (| = horizon)
# key 1:  I@1                 |                            -> trimmed-only key, survives via chunk
# key 2:  I@2      D@4        |                            -> deleted pre-horizon, must stay absent
# key 3:  I@3                 |     U@7                    -> chunk image then log update wins
# key 4:          I@4         |         D@8                -> live delete of snapshot row
# key 5:              I@5     |              I@9 (re-ins after nothing)   -> tie/ordering noise
# key 6:                      | I@6          U@10          -> live-only key
HISTORY = [
    (1, 1, "I", 1.0),
    (2, 2, "I", 2.0),
    (3, 3, "I", 3.0),
    (2, 4, "D", None),
    (4, 4, "I", 4.0),
    (5, 5, "I", 5.0),
    (6, 6, "I", 6.0),
    (3, 7, "U", 3.7),
    (4, 8, "D", None),
    (5, 9, "I", 5.9),
    (6, 10, "U", 6.1),
]
HORIZON = 5  # log retention: only lsn > 5 survives

# full-history LWW final state (the oracle, by hand)
EXPECT = {1: (1, 1.0), 3: (7, 3.7), 5: (9, 5.9), 6: (10, 6.1)}


def _hist(spark):
    return spark.createDataFrame(
        [(k, l, o, v) for (k, l, o, v) in HISTORY], SCHEMA
    )


def _state(spark, table):
    return {
        r["doc_key"]: (r["change_lsn"], r["value"])
        for r in table.read(spark).collect()
    }


def test_bootstrap_matches_full_history_replay(spark, tmp_path):
    hist = _hist(spark)
    live = hist.where(F.col("change_lsn") > HORIZON)
    table = LakeTable(str(tmp_path / "t"))
    stats = bootstrap_ingest(
        table, live, log_prefix_chunk_reader(hist), CFG, n_chunks=3
    )
    assert _state(spark, table) == EXPECT
    # every epoch committed exactly once, none skipped on first run
    assert not any(s.skipped for s in stats)


def test_bootstrap_resumes_idempotently(spark, tmp_path):
    hist = _hist(spark)
    live = hist.where(F.col("change_lsn") > HORIZON)
    table = LakeTable(str(tmp_path / "t"))
    bootstrap_ingest(table, live, log_prefix_chunk_reader(hist), CFG, n_chunks=3)
    v = table.current_version()
    # crash-and-rerun: every epoch replays as a no-op
    stats = bootstrap_ingest(
        table, live, log_prefix_chunk_reader(hist), CFG, n_chunks=3
    )
    assert all(s.skipped for s in stats)
    assert table.current_version() == v
    assert _state(spark, table) == EXPECT


def test_interleave_is_commutative(spark, tmp_path):
    """Chunks applied after (not interleaved with) the log tail reach
    the same state — the version-ordered merge subsumes DBLog's
    watermark-window dedup."""
    hist = _hist(spark)
    live = hist.where(F.col("change_lsn") > HORIZON)
    reader = log_prefix_chunk_reader(hist)
    table = LakeTable(str(tmp_path / "t2"))
    apply_change_batch(table, live, "log-all", CFG)
    for i in range(3):
        # worst case: every chunk read at the freshest watermark, landing last
        apply_change_batch(table, reader(i, 3, 10), f"chunk-{i}", CFG)
    assert _state(spark, table) == EXPECT


def test_chunk_reader_images(spark):
    """Chunk rows carry their key's true stored lsn and drop deleted
    keys; the union of all chunks at the max watermark is exactly the
    LWW state."""
    hist = _hist(spark)
    reader = log_prefix_chunk_reader(hist)
    rows = {}
    for i in range(4):
        for r in reader(i, 4, 10).collect():
            assert r["op"] == "r"
            assert r["doc_key"] not in rows, "chunks must partition the key space"
            rows[r["doc_key"]] = (r["change_lsn"], r["value"])
    assert rows == EXPECT


def test_empty_live_log_requires_bounds(spark, tmp_path):
    hist = _hist(spark)
    empty = hist.where(F.lit(False))
    table = LakeTable(str(tmp_path / "t3"))
    with pytest.raises(ValueError, match="lsn_bounds"):
        bootstrap_ingest(table, empty, log_prefix_chunk_reader(hist), CFG)
    # pure-snapshot bootstrap: bounds supplied, no live rows
    bootstrap_ingest(
        table, empty, log_prefix_chunk_reader(hist), CFG,
        n_chunks=2, lsn_bounds=(10, 10),
    )
    assert _state(spark, table) == EXPECT
