"""Token-level delta profile (operators/token_delta.py).

Hand-computed prefix/suffix/added/removed for the edit shapes a
tokenized-document update stream actually produces: tail growth,
mid-span edit, shrink with overlapping prefix+suffix (the cap case),
full rewrite, and delete-crossing pairs that must be excluded.
"""

from __future__ import annotations

from pyspark.sql import types as T

from airbyte_destination_spark.operators.token_delta import token_delta

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("change_lsn", T.LongType(), False),
        T.StructField("op", T.StringType(), False),
        T.StructField("tokens", T.ArrayType(T.IntegerType()), True),
    ]
)


def _run(spark, rows, **kw):
    df = token_delta(spark.createDataFrame(rows, SCHEMA), key_col="doc_id", **kw)
    return {
        (r["doc_id"], r["lsn"]): (
            r["prefix_len"],
            r["suffix_len"],
            r["added"],
            r["removed"],
        )
        for r in df.collect()
    }


def test_edit_shapes(spark):
    rows = [
        # a: tail growth — prefix covers all of prev, nothing added twice
        ("a", 1, "U", [1, 2, 3]),
        ("a", 2, "U", [1, 2, 3, 4, 5]),
        # a: identical resend — zero-cost edit (suffix capped to 0 so
        # prefix + suffix never exceeds the shorter array)
        ("a", 3, "U", [1, 2, 3, 4, 5]),
        # b: mid-span edit — prefix 2, suffix 2, one token swapped
        ("b", 1, "U", [1, 2, 3, 4, 5]),
        ("b", 2, "U", [1, 2, 9, 4, 5]),
        # b: shrink where prefix and suffix would double-count overlap
        ("b", 3, "U", [1, 2]),
        # c: full rewrite — no common affix at all
        ("c", 1, "U", [1, 2, 3]),
        ("c", 2, "U", [7, 8]),
    ]
    got = _run(spark, rows)
    assert got == {
        ("a", 2): (3, 0, 2, 0),
        ("a", 3): (5, 0, 0, 0),
        ("b", 2): (2, 2, 1, 1),
        # prev=[1,2,9,4,5] cur=[1,2]: prefix 2, raw reverse-run 0
        ("b", 3): (2, 0, 0, 3),
        ("c", 2): (0, 0, 2, 3),
    }


def test_shrink_cap_with_repeating_pattern(spark):
    # prev=[1,2,1,2] cur=[1,2]: prefix 2 and reverse-run 2 overlap on the
    # same two tokens; suffix must be capped to min(len)-prefix = 0
    rows = [("a", 1, "U", [1, 2, 1, 2]), ("a", 2, "U", [1, 2])]
    assert _run(spark, rows) == {("a", 2): (2, 0, 0, 2)}


def test_delete_resets_history(spark):
    rows = [
        ("a", 1, "U", [1, 2, 3]),
        ("a", 2, "D", None),
        ("a", 3, "U", [1, 2, 3]),  # re-insert: no prev to diff against
        ("a", 4, "U", [1, 2, 4]),  # but the next pair diffs normally
    ]
    assert _run(spark, rows, op_col="op") == {("a", 4): (2, 0, 1, 1)}


def test_without_op_col_null_prev_rows_dropped(spark):
    rows = [("a", 1, "U", None), ("a", 2, "U", [5, 6])]
    # lag of the first real version is the NULL array -> excluded
    assert _run(spark, rows) == {}


def test_first_version_per_key_excluded(spark):
    rows = [("a", 1, "U", [1]), ("b", 1, "U", [2])]
    assert _run(spark, rows) == {}
