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


# ---------------------------------------------------------------- encode


from airbyte_destination_spark.operators.token_delta import (  # noqa: E402
    delta_encode,
    delta_reconstruct,
    signed_token_deltas,
    token_histogram,
)


def test_signed_deltas_ship_only_the_edit(spark):
    rows = [
        ("a", 1, "U", [1, 2, 3, 4]),        # insert: +whole image
        ("a", 2, "U", [1, 2, 9, 9, 3, 4]),  # mid insert: +[9,9] only
        ("a", 3, "D", None),                # delete: -whole previous image
        ("a", 4, "U", [5]),                 # re-insert after tombstone
    ]
    df = signed_token_deltas(spark.createDataFrame(rows, SCHEMA), key_col="doc_id")
    got = {r["lsn"]: (r["added"], r["removed"]) for r in df.collect()}
    assert got == {
        1: ([1, 2, 3, 4], []),
        2: ([9, 9], []),
        3: ([], [1, 2, 9, 9, 3, 4]),
        4: ([5], []),
    }


def test_token_histogram_matches_final_images(spark):
    rows = [
        ("a", 1, "U", [1, 1, 2]),
        ("a", 2, "U", [1, 2, 3]),       # -1, +3
        ("b", 1, "U", [2, 2]),
        ("b", 2, "D", None),            # b gone entirely
        ("c", 1, "U", [3, 1, 3]),
        ("c", 2, "U", [3, 1, 3]),       # no-op resend: zero contribution
    ]
    df = token_histogram(spark.createDataFrame(rows, SCHEMA), key_col="doc_id")
    got = {r["token"]: r["cnt"] for r in df.collect()}
    # final images: a=[1,2,3], c=[3,1,3]
    assert got == {1: 2, 2: 1, 3: 3}


def _encode(spark, rows, **kw):
    df = delta_encode(spark.createDataFrame(rows, SCHEMA), key_col="doc_id", **kw)
    return {
        (r["doc_id"], r["change_lsn"]): (
            r["kind"],
            r["prefix_len"],
            r["suffix_len"],
            r["middle"],
        )
        for r in df.collect()
    }


def test_encode_shapes(spark):
    rows = [
        ("a", 1, "U", [1, 2, 3]),          # first version -> full
        ("a", 2, "U", [1, 2, 3, 4, 5]),    # tail growth -> delta [4,5]
        ("a", 3, "U", [1, 9, 3, 4, 5]),    # mid edit -> delta [9]
        ("a", 4, "D", None),               # tombstone
        ("a", 5, "U", [7, 8]),             # post-delete -> full again
    ]
    assert _encode(spark, rows) == {
        ("a", 1): ("F", 0, 0, [1, 2, 3]),
        ("a", 2): ("d", 3, 0, [4, 5]),
        ("a", 3): ("d", 1, 3, [9]),
        ("a", 4): ("D", 0, 0, None),
        ("a", 5): ("F", 0, 0, [7, 8]),
    }


def test_encode_checkpoint_cadence(spark):
    rows = [("a", i, "U", [1, 2, i]) for i in range(1, 8)]
    enc = _encode(spark, rows, full_every=3)
    kinds = [enc[("a", i)][0] for i in range(1, 8)]
    # versions 1, 4, 7 are checkpoints (every 3rd), the rest deltas
    assert kinds == ["F", "d", "d", "F", "d", "d", "F"]


def _reconstruct(spark, rows, **kw):
    enc = delta_encode(spark.createDataFrame(rows, SCHEMA), key_col="doc_id", **kw)
    out = delta_reconstruct(enc, key_col="doc_id")
    return {
        r["doc_id"]: (r["last_lsn"], r["tokens"], r["n_tok"]) for r in out.collect()
    }


def test_roundtrip_matches_latest_image(spark):
    rows = [
        ("a", 1, "U", [1, 2, 3]),
        ("a", 2, "U", [1, 2, 3, 4, 5]),
        ("a", 3, "U", [0, 2, 3, 4, 9]),
        ("b", 1, "U", [6]),
        ("b", 2, "D", None),               # deleted key stays absent
        ("c", 1, "U", [7, 7]),
        ("c", 2, "D", None),
        ("c", 3, "U", [8]),                # re-insert after tombstone
        ("c", 4, "U", [8, 9]),
    ]
    assert _reconstruct(spark, rows, full_every=100) == {
        "a": (3, [0, 2, 3, 4, 9], 5),
        "c": (4, [8, 9], 2),
    }


def test_roundtrip_randomized_against_direct_latest(spark):
    # 12 keys x 40 versions of hash-derived edits; reconstruct must equal
    # the plain latest image for every checkpoint cadence
    import hashlib

    def tok(doc, i):
        return int(hashlib.md5(f"{doc}:t:{i}".encode()).hexdigest()[:6], 16) % 997

    rows = []
    latest = {}
    for d in range(12):
        doc = f"k{d}"
        cur = None
        for v in range(1, 41):
            h = int(hashlib.md5(f"{doc}:{v}".encode()).hexdigest()[:6], 16)
            if h % 11 == 0:
                rows.append((doc, v, "D", None))
                cur = None
                continue
            n = 1 + (h % 24)
            p = min(h // 7 % 13, n)
            arr = [tok(doc, i) if i <= p else tok(f"{doc}:{v}", i) for i in range(1, n + 1)]
            rows.append((doc, v, "U", arr))
            cur = (v, arr)
        if cur is not None:
            latest[doc] = (cur[0], cur[1], len(cur[1]))
    for fe in (1, 4, 1000):
        assert _reconstruct(spark, rows, full_every=fe) == latest


def test_reconstruct_reads_only_tail_since_checkpoint(spark):
    # drop all pre-checkpoint rows: reconstruction must not change,
    # proving the fold never needs history older than the last 'F'
    rows = [("a", i, "U", [i, i + 1, 42]) for i in range(1, 10)]
    enc = delta_encode(
        spark.createDataFrame(rows, SCHEMA), key_col="doc_id", full_every=4
    )
    full = {r["doc_id"]: (r["last_lsn"], r["tokens"]) for r in
            delta_reconstruct(enc, key_col="doc_id").collect()}
    from pyspark.sql import functions as F
    trimmed = enc.where(F.col("change_lsn") >= 9)  # lsn 9 = 3rd checkpoint
    assert (
        {r["doc_id"]: (r["last_lsn"], r["tokens"]) for r in
         delta_reconstruct(trimmed, key_col="doc_id").collect()}
        == full
    )
