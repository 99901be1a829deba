"""Partial-image update reduce (the third merge engine next to LWW and
append): per-column last-non-null fold with delete cut, standalone and
through LakeTable.merge(reduce="partial") across ordered epochs.

Reference frame: the reference destination forwards whole-row images
(destination.go); partial images are the Debezium/Paimon `partial-update`
shape a warehouse sink must fold when the upstream emits only changed
columns. Semantics doc: operators/dedup.partial_update_reduce.
"""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from airbyte_destination_spark.lake import LakeTable
from airbyte_destination_spark.operators.dedup import partial_update_reduce

LOG_SCHEMA = "id int, v long, a string, b string, c string, op string"


def _reduce(spark, rows):
    df = spark.createDataFrame(rows, LOG_SCHEMA)
    return {
        r.id: (r.v, r.a, r.b, r.c, r.op)
        for r in partial_update_reduce(df, ["id"], "v").collect()
    }


def test_last_non_null_per_column(spark):
    out = _reduce(
        spark,
        [
            (1, 1, "a1", "b1", "c1", "I"),
            (1, 2, None, "b2", None, "U"),  # touches only b
            (1, 3, None, None, "c3", "U"),  # touches only c
        ],
    )
    assert out == {1: (3, "a1", "b2", "c3", "U")}


def test_delete_cuts_history_and_revival_is_partial(spark):
    out = _reduce(
        spark,
        [
            (2, 1, "a1", "b1", "c1", "I"),
            (2, 2, None, None, None, "D"),
            (2, 3, None, "b3", None, "U"),  # revival writes only b
            (3, 1, "x", "y", "z", "I"),
            (3, 2, None, None, None, "D"),  # dead key
        ],
    )
    # pre-delete writes to a/c must NOT survive into the revived row
    assert out[2] == (3, None, "b3", None, "U")
    # dead key keeps the tombstone version and nulls, flagged 'D'
    assert out[3] == (2, None, None, None, "D")


def test_out_of_order_within_batch(spark):
    out = _reduce(
        spark,
        [
            (4, 5, None, "b5", None, "U"),
            (4, 2, "a2", "b2", "c2", "I"),
        ],
    )
    assert out == {4: (5, "a2", "b5", "c2", "U")}


def test_update_cannot_null_a_column(spark):
    # null means "not written" — a later all-null U leaves values intact
    out = _reduce(
        spark,
        [(5, 1, "a", "b", "c", "I"), (5, 2, None, None, None, "U")],
    )
    assert out == {5: (2, "a", "b", "c", "U")}


@pytest.fixture()
def ptable(tmp_table_root):
    t = LakeTable(tmp_table_root)
    t.create(
        T.StructType(
            [
                T.StructField("id", T.IntegerType(), False),
                T.StructField("v", T.LongType(), False),
                T.StructField("a", T.StringType(), True),
                T.StructField("b", T.StringType(), True),
                T.StructField("c", T.StringType(), True),
            ]
        ),
        key_cols=["id"],
        version_col="v",
        n_buckets=4,
        merge_strategy="cow",
    )
    return t


def test_merge_partial_cross_batch_inherits_columns(spark, ptable):
    b1 = spark.createDataFrame(
        [(1, 1, "a1", "b1", "c1", "I"), (2, 1, "x1", "y1", "z1", "I")], LOG_SCHEMA
    )
    ptable.merge(b1, epoch_id="e0", reduce="partial")
    # epoch 1: partial update of b for key 1; delete key 2
    b2 = spark.createDataFrame(
        [(1, 2, None, "b2", None, "U"), (2, 2, None, None, None, "D")], LOG_SCHEMA
    )
    ptable.merge(b2, epoch_id="e1", reduce="partial")
    state = {r.id: (r.v, r.a, r.b, r.c) for r in ptable.read(spark).collect()}
    assert state == {1: (2, "a1", "b2", "c1")}
    # epoch 2: revival of key 2 writes only c; stored tombstone cuts a/b
    b3 = spark.createDataFrame([(2, 3, None, None, "z3", "U")], LOG_SCHEMA)
    ptable.merge(b3, epoch_id="e2", reduce="partial")
    state = {r.id: (r.v, r.a, r.b, r.c) for r in ptable.read(spark).collect()}
    assert state == {1: (2, "a1", "b2", "c1"), 2: (3, None, None, "z3")}


def test_merge_partial_epochs_equal_one_shot_fold(spark, ptable):
    """Ordered-epoch lake merges == one global partial fold over the
    whole log (the in-order-batch invariant the docstring states)."""
    rows = []
    for k in range(24):
        for step in range(6):
            lsn = k * 100 + step * 10
            if step == 3 and k % 4 == 0:
                rows.append((k, lsn, None, None, None, "D"))
            else:
                # deterministic sparse column writes
                a = f"a{lsn}" if (k + step) % 3 == 0 else None
                b = f"b{lsn}" if (k + step) % 2 == 0 else None
                c = f"c{lsn}" if step % 5 == 1 else None
                rows.append((k, lsn, a, b, c, "I" if step == 0 else "U"))
    log = spark.createDataFrame(rows, LOG_SCHEMA)
    # 3 ordered lsn-range epochs through the real engine
    for i, (lo, hi) in enumerate([(0, 800), (800, 1600), (1600, 10_000)]):
        ptable.merge(
            log.where((F.col("v") >= lo) & (F.col("v") < hi)),
            epoch_id=f"e{i}",
            reduce="partial",
        )
    engine = {
        r.id: (r.v, r.a, r.b, r.c) for r in ptable.read(spark).collect()
    }
    oneshot = {
        r.id: (r.v, r.a, r.b, r.c)
        for r in partial_update_reduce(log, ["id"], "v").where(F.col("op") == "U").collect()
    }
    assert engine == oneshot
    # every deleted key was revived by its steps 4-5 (lsn above the cut)
    assert set(engine) == set(range(24))
    # and the revived rows carry ONLY post-delete writes
    for k in range(0, 24, 4):
        v, a, b, c = engine[k]
        for col in (a, b, c):
            assert col is None or int(col[1:]) > k * 100 + 30


def test_partial_requires_cow_and_version(spark, tmp_path):
    mor = LakeTable(str(tmp_path / "mor"))
    mor.create(
        T.StructType(
            [
                T.StructField("id", T.IntegerType(), False),
                T.StructField("v", T.LongType(), False),
            ]
        ),
        key_cols=["id"],
        version_col="v",
        n_buckets=2,
        merge_strategy="mor",
    )
    batch = spark.createDataFrame([(1, 1, "I")], "id int, v long, op string")
    with pytest.raises(ValueError, match="COW"):
        mor.merge(batch, reduce="partial")
    with pytest.raises(ValueError, match="unknown reduce"):
        mor.merge(batch, reduce="bogus")
    with pytest.raises(ValueError, match="post_reduce"):
        mor.merge(batch, reduce="partial", post_reduce=lambda d: d)
