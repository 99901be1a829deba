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
