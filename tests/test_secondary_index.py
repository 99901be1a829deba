"""Record-level secondary index maintained from the change feed:
correctness across inserts, value-moving updates, same-value updates,
deletes and re-inserts; exactly-once refresh; probe plan shape.

Reference frame: the reference delegates lookup acceleration to
ClickHouse ORDER-BY/skip indexes (destination.go:337-351); this is the
lakehouse record-index equivalent built on the engine's own CDF +
consumer offsets + LWW merge.
"""

import pytest
from pyspark.sql import types as T

from airbyte_destination_spark.lake import LakeTable
from airbyte_destination_spark.operators.secondary_index import (
    create_index,
    lookup,
    refresh_index,
)

S = "k long, cat string, payload string, v long, op string"


@pytest.fixture()
def base(spark, tmp_path):
    t = LakeTable(str(tmp_path / "base"))
    t.create(
        T.StructType(
            [
                T.StructField("k", T.LongType(), False),
                T.StructField("cat", T.StringType(), True),
                T.StructField("payload", T.StringType(), True),
                T.StructField("v", T.LongType(), False),
            ]
        ),
        ["k"],
        "v",
        n_buckets=4,
    )
    return t


def _probe(spark, base, idx, value):
    return sorted(
        (r.k, r.cat) for r in lookup(spark, base, idx, [value]).collect()
    )


def test_index_tracks_base_through_full_lifecycle(spark, tmp_path, base):
    idx = create_index(base, str(tmp_path / "idx"), "cat", n_buckets=8)

    base.merge(
        spark.createDataFrame(
            [(1, "red", "p1", 1, "I"), (2, "blue", "p2", 2, "I"), (3, "red", "p3", 3, "I")],
            S,
        ),
        epoch_id="b-0",
    )
    assert refresh_index(spark, base, idx, "cat") == base.current_version()
    assert _probe(spark, base, idx, "red") == [(1, "red"), (3, "red")]
    assert _probe(spark, base, idx, "blue") == [(2, "blue")]

    # value-moving update, same-value update (version bump), delete
    base.merge(
        spark.createDataFrame(
            [(1, "blue", "p1b", 10, "U"), (3, "red", "p3b", 11, "U"),
             (2, None, None, 12, "D")],
            S,
        ),
        epoch_id="b-1",
    )
    refresh_index(spark, base, idx, "cat")
    assert _probe(spark, base, idx, "red") == [(3, "red")]
    assert _probe(spark, base, idx, "blue") == [(1, "blue")]

    # re-insert a deleted key under an old value
    base.merge(
        spark.createDataFrame([(2, "red", "p2c", 20, "I")], S), epoch_id="b-2"
    )
    refresh_index(spark, base, idx, "cat")
    assert _probe(spark, base, idx, "red") == [(2, "red"), (3, "red")]
    # nothing new -> no-op refresh
    assert refresh_index(spark, base, idx, "cat") is None
    # index state matches a direct base filter for every live value
    for val in ("red", "blue"):
        direct = sorted(
            (r.k, r.cat)
            for r in base.read(spark).where(f"cat = '{val}'").collect()
        )
        assert _probe(spark, base, idx, val) == direct


def test_index_refresh_is_idempotent_after_lost_ack(spark, tmp_path, base):
    """Crash between merge and ack: the re-poll re-delivers a window
    whose epoch id is already applied -> merge skips, ack advances."""
    import os

    idx = create_index(base, str(tmp_path / "idx"), "cat", n_buckets=4)
    base.merge(
        spark.createDataFrame([(1, "x", "p", 1, "I"), (2, "y", "q", 2, "I")], S),
        epoch_id="c-0",
    )
    v = refresh_index(spark, base, idx, "cat")
    os.unlink(base._consumer_path("__index_cat"))  # lose the ack
    assert refresh_index(spark, base, idx, "cat") == v  # skip + re-ack
    assert idx.read(spark).count() == 2
    assert _probe(spark, base, idx, "x") == [(1, "x")]


def test_index_probe_plan_and_validation(spark, tmp_path, base):
    idx = create_index(base, str(tmp_path / "idx"), "cat", n_buckets=8)
    base.merge(
        spark.createDataFrame(
            [(i, f"c{i % 7}", "p", i, "I") for i in range(1, 40)], S
        ),
        epoch_id="p-0",
    )
    refresh_index(spark, base, idx, "cat")
    probe = idx.read_prefix(spark, ["c3", "c5"])
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "In(cat" in plan, plan  # pushed predicate reaches the scan
    got = sorted(r.k for r in probe.collect())
    assert got == [i for i in range(1, 40) if i % 7 in (3, 5)]
    with pytest.raises(ValueError, match="key/version"):
        create_index(base, str(tmp_path / "bad"), "v")
    with pytest.raises(ValueError, match="subset"):
        LakeTable(str(tmp_path / "bad2")).create(
            T.StructType([T.StructField("a", T.LongType(), False)]),
            ["a"],
            None,
            bucket_cols=["nope"],
        )


def test_index_rides_run_ingest_batches(spark, tmp_path):
    """indexes= on run_ingest_batches: the index refreshes after every
    applied epoch and a resumed replay (epoch skips) leaves it
    consistent."""
    from pyspark.sql import functions as F

    from airbyte_destination_spark.streaming.pipeline import (
        IngestConfig,
        run_ingest_batches,
    )

    dirs = []
    for b in range(3):
        rows = [
            (f"d{k:02d}", f"s{(k + b) % 3}", [k, b], 2, b * 100 + k, "I" if b == 0 else "U")
            for k in range(20)
        ]
        d = str(tmp_path / f"log/b{b}")
        spark.createDataFrame(
            rows,
            "doc_id string, source string, tokens array<int>, n_tok int, "
            "change_lsn long, op string",
        ).write.parquet(d)
        dirs.append(d)

    base = LakeTable(str(tmp_path / "t"))
    cfg = IngestConfig(n_buckets=4)
    run_ingest_batches(spark, dirs[:1], base, cfg)  # create table first
    idx = create_index(base, str(tmp_path / "idx"), "source", n_buckets=4)
    run_ingest_batches(spark, dirs, base, cfg, indexes=[(idx, "source")])

    direct = sorted(
        r.doc_id for r in base.read(spark).where("source = 's1'").collect()
    )
    via_index = sorted(r.doc_id for r in lookup(spark, base, idx, ["s1"]).collect())
    assert via_index == direct and len(direct) > 0
    # resume: full replay skips applied epochs; index stays consistent
    run_ingest_batches(spark, dirs, base, cfg, indexes=[(idx, "source")])
    assert sorted(
        r.doc_id for r in lookup(spark, base, idx, ["s1"]).collect()
    ) == direct
