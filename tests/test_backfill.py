"""Online, resumable, bucket-scoped column backfill (lake/table.py
backfill): the production answer to "a schema evolution landed on a
10^10-row table and historical rows must be populated" — per-bucket
epoch-marked commits, online readers, pacing, selective `where`.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from airbyte_destination_spark.lake import LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("change_lsn", T.LongType(), False),
        T.StructField("tokens", T.ArrayType(T.IntegerType()), True),
    ]
)


def _table(spark, path, n_rows=40, n_buckets=4, strategy="cow"):
    t = LakeTable(path)
    t.create(SCHEMA, ["doc_id"], "change_lsn", n_buckets=n_buckets,
             merge_strategy=strategy)
    rows = [
        (f"d{i}", i, [i % 7, i % 5, i % 3]) for i in range(n_rows)
    ]
    df = spark.createDataFrame(rows, SCHEMA).withColumn("op", F.lit("U"))
    t.merge(df, epoch_id="seed")
    return t


def _state(spark, t, cols):
    return {r["doc_id"]: tuple(r[c] for c in cols) for r in t.read(spark).collect()}


def test_backfill_adds_column_everywhere(spark, tmp_path):
    t = _table(spark, str(tmp_path / "t"))
    res = t.backfill(spark, {"n_tok": "size(tokens)"}, buckets_per_commit=2)
    assert res["complete"] and res["schema_evolved"]
    assert res["groups_done"] == 2 and res["buckets_rewritten"] == 4
    got = _state(spark, t, ["n_tok"])
    assert got == {f"d{i}": (3,) for i in range(40)}
    # idempotent rerun: every group (and the schema step) skips
    res2 = t.backfill(spark, {"n_tok": "size(tokens)"}, buckets_per_commit=2)
    assert res2["groups_done"] == 0 and res2["groups_skipped"] == 2
    assert not res2["schema_evolved"]


def test_backfill_paced_then_resumed(spark, tmp_path):
    t = _table(spark, str(tmp_path / "t"))
    first = t.backfill(
        spark, {"n_tok": "size(tokens)"}, buckets_per_commit=1, max_groups=2
    )
    assert not first["complete"] and first["groups_done"] == 2
    # mid-campaign: readers are online; pending rows read as NULL
    part = t.read(spark)
    assert part.where(F.col("n_tok").isNull()).count() > 0
    assert part.count() == 40
    rest = t.backfill(spark, {"n_tok": "size(tokens)"}, buckets_per_commit=1)
    assert rest["complete"] and rest["groups_skipped"] == first["groups_done"]
    assert rest["groups_done"] == 4 - first["groups_done"]
    assert _state(spark, t, ["n_tok"]) == {f"d{i}": (3,) for i in range(40)}


def test_backfill_where_scopes_the_rewrite(spark, tmp_path):
    t = _table(spark, str(tmp_path / "t"))
    t.backfill(spark, {"n_tok": "size(tokens)"},
               where="change_lsn % 2 = 0", buckets_per_commit=4)
    got = _state(spark, t, ["change_lsn", "n_tok"])
    for doc, (lsn, n) in got.items():
        assert n == (3 if lsn % 2 == 0 else None), (doc, lsn, n)


def test_backfill_recomputes_existing_column(spark, tmp_path):
    t = _table(spark, str(tmp_path / "t"))
    t.backfill(spark, {"tokens": "slice(tokens, 1, 2)"}, buckets_per_commit=4)
    got = _state(spark, t, ["tokens"])
    assert all(len(v[0]) == 2 for v in got.values())


def test_backfill_mor_folds_deltas_first(spark, tmp_path):
    t = _table(spark, str(tmp_path / "t"), strategy="mor")
    # newer versions for half the keys land as MOR deltas
    upd = spark.createDataFrame(
        [(f"d{i}", 100 + i, [9, 9, 9, 9]) for i in range(0, 40, 2)], SCHEMA
    ).withColumn("op", F.lit("U"))
    t.merge(upd, epoch_id="upd")
    t.backfill(spark, {"n_tok": "size(tokens)"}, buckets_per_commit=2)
    got = _state(spark, t, ["n_tok"])
    assert got == {f"d{i}": (4 if i % 2 == 0 else 3,) for i in range(40)}


def test_backfill_survives_concurrent_ingest(spark, tmp_path):
    # a merge lands between backfill group commits; its rows carry the
    # evolved schema and the final state is consistent
    t = _table(spark, str(tmp_path / "t"))
    t.backfill(spark, {"n_tok": "size(tokens)"}, buckets_per_commit=1, max_groups=1)
    # a writer that has adopted the evolved schema lands mid-campaign
    # (the backfill contract: post-evolution writers populate the
    # column themselves; backfill owns only pre-evolution history)
    mid = spark.createDataFrame(
        [("d1", 1000, [1, 2, 3, 4, 5], 5)],
        T.StructType(SCHEMA.fields + [T.StructField("n_tok", T.IntegerType(), True)]),
    ).withColumn("op", F.lit("U"))
    t.merge(mid, epoch_id="mid")
    t.backfill(spark, {"n_tok": "size(tokens)"}, buckets_per_commit=1)
    got = _state(spark, t, ["change_lsn", "n_tok"])
    # d1's newer image won LWW regardless of whether its bucket was
    # backfilled before or after the merge landed
    assert got["d1"] == (1000, 5)
    assert all(v[1] is not None for v in got.values())
