"""SCD Type-2 derivation and incremental refresh (operators/scd.py)."""

from pyspark.sql import functions as F

from airbyte_destination_spark.operators.scd import scd2_apply, scd2_history


def _log(spark, rows):
    return spark.createDataFrame(
        rows, "doc_key string, change_lsn long, op string, val string"
    )


ROWS = [
    ("a", 1, "I", "a1"),
    ("a", 3, "U", "a3"),
    ("a", 7, "U", "a7"),
    ("b", 2, "I", "b2"),
    ("b", 5, "D", None),  # trailing delete: b has no current row
    ("c", 4, "I", "c4"),
    ("c", 6, "D", None),
    ("c", 9, "I", "c9"),  # reinsert after delete opens a fresh version
]


def test_scd2_history_semantics(spark):
    h = scd2_history(_log(spark, ROWS), ["doc_key"])
    got = {
        (r.doc_key, r.valid_from): (r.valid_to, r.is_current, r.val)
        for r in h.collect()
    }
    assert got == {
        ("a", 1): (3, False, "a1"),
        ("a", 3): (7, False, "a3"),
        ("a", 7): (None, True, "a7"),
        ("b", 2): (5, False, "b2"),  # closed by the delete
        ("c", 4): (6, False, "c4"),
        ("c", 9): (None, True, "c9"),
    }
    # exactly one current row per live key, none for deleted b
    cur = {r.doc_key for r in h.where("is_current").collect()}
    assert cur == {"a", "c"}


def test_scd2_history_single_exchange(spark):
    plan = scd2_history(
        _log(spark, ROWS), ["doc_key"]
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1  # one keyed shuffle, no self-join
    assert "Join" not in plan


def test_scd2_apply_matches_full_log(spark):
    """Incremental refresh over the current slice == full-log rerun."""
    cutoff = 5
    full = _log(spark, ROWS)
    head = full.where(F.col("change_lsn") <= cutoff)
    batch = full.where(F.col("change_lsn") > cutoff)

    hist_head = scd2_history(head, ["doc_key"])
    touched = [r.doc_key for r in batch.select("doc_key").distinct().collect()]
    current = hist_head.where(
        F.col("is_current") & F.col("doc_key").isin(touched)
    )
    refreshed = scd2_apply(current, batch, ["doc_key"])

    # replacement rows for touched keys + untouched closed/open history
    kept = hist_head.where(
        ~(F.col("is_current") & F.col("doc_key").isin(touched))
    )
    combined = {
        (r.doc_key, r.valid_from): (r.valid_to, r.is_current, r.val)
        for r in kept.unionByName(refreshed).collect()
    }
    expect = {
        (r.doc_key, r.valid_from): (r.valid_to, r.is_current, r.val)
        for r in scd2_history(full, ["doc_key"]).collect()
    }
    assert combined == expect


def test_scd2_apply_new_key_and_trailing_delete(spark):
    current = scd2_history(
        _log(spark, [("a", 1, "I", "a1")]), ["doc_key"]
    ).where("is_current")
    batch = _log(spark, [("a", 4, "D", None), ("z", 2, "I", "z2")])
    out = {
        (r.doc_key, r.valid_from): (r.valid_to, r.is_current)
        for r in scd2_apply(current, batch, ["doc_key"]).collect()
    }
    assert out == {("a", 1): (4, False), ("z", 2): (None, True)}


# ------------------------------------------------- materialized history

from unittest import mock

import pytest
from pyspark.sql import types as T

from airbyte_destination_spark.lake import LakeTable
from airbyte_destination_spark.operators.scd import (
    create_history,
    history_as_of,
    refresh_history,
)

_BS = "k long, payload string, v long, op string"


def _base(spark, tmp_path):
    t = LakeTable(str(tmp_path / "base"))
    t.create(
        T.StructType(
            [
                T.StructField("k", T.LongType(), False),
                T.StructField("payload", T.StringType(), True),
                T.StructField("v", T.LongType(), False),
            ]
        ),
        ["k"],
        "v",
        n_buckets=4,
    )
    return t


def _hist_rows(spark, hist):
    return {
        (r.k, r.valid_from): (r.valid_to, r.is_current, r.payload)
        for r in hist.read(spark).collect()
    }


def test_materialized_history_lifecycle(spark, tmp_path):
    base = _base(spark, tmp_path)
    hist = create_history(base, str(tmp_path / "hist"), n_buckets=4)

    base.merge(
        spark.createDataFrame([(1, "a", 1, "I"), (2, "b", 2, "I")], _BS), "e1"
    )
    v1 = refresh_history(spark, base, hist)
    assert v1 == base.current_version()

    base.merge(
        spark.createDataFrame(
            [(1, "a2", 3, "U"), (2, None, 4, "D"), (3, "c", 5, "I")], _BS
        ),
        "e2",
    )
    v2 = refresh_history(spark, base, hist)

    assert _hist_rows(spark, hist) == {
        (1, v1): (v2, False, "a"),
        (1, v2): (None, True, "a2"),
        (2, v1): (v2, False, "b"),   # delete closes, opens nothing
        (3, v2): (None, True, "c"),
    }

    # nothing new -> no-op
    assert refresh_history(spark, base, hist) is None

    # re-insert after delete opens a fresh version; closed history kept
    base.merge(spark.createDataFrame([(2, "b2", 6, "I")], _BS), "e3")
    v3 = refresh_history(spark, base, hist)
    rows = _hist_rows(spark, hist)
    assert rows[(2, v3)] == (None, True, "b2")
    assert rows[(2, v1)] == (v2, False, "b")

    # as-of reconstruction equals base time travel at every refresh point
    for v in (v1, v2, v3):
        got = sorted(
            (r.k, r.payload, r.v) for r in history_as_of(spark, hist, v).collect()
        )
        exp = sorted(
            (r.k, r.payload, r.v)
            for r in base.read(spark, version=v).collect()
        )
        assert got == exp, v


def test_refresh_history_lost_ack_is_exactly_once(spark, tmp_path):
    base = _base(spark, tmp_path)
    hist = create_history(base, str(tmp_path / "hist"), n_buckets=4)
    base.merge(spark.createDataFrame([(1, "a", 1, "I")], _BS), "e1")
    v1 = refresh_history(spark, base, hist)

    base.merge(
        spark.createDataFrame([(1, "a2", 2, "U"), (7, "g", 3, "I")], _BS), "e2"
    )
    # crash between merge and ack: the merge lands, the offset doesn't
    with mock.patch.object(
        base, "ack", side_effect=RuntimeError("crash before ack")
    ):
        with pytest.raises(RuntimeError):
            refresh_history(spark, base, hist)

    # recovery re-polls the same window; the scd2-<v> epoch marker
    # skips the re-application, then the ack lands
    v2 = refresh_history(spark, base, hist)
    assert v2 == base.current_version()
    assert _hist_rows(spark, hist) == {
        (1, v1): (v2, False, "a"),
        (1, v2): (None, True, "a2"),
        (7, v2): (None, True, "g"),
    }
