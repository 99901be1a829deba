"""Token-level delta profile over a change log of token sequences.

When the CDC payload is a pre-tokenized training sequence (the
input_hint shape: doc_id, tokens array<int>), most updates are EDITS of
the previous version — documents grow at the tail, lose headers, or
change a span in the middle. The delta profile quantifies that: for
each update, the longest common prefix and suffix between the previous
and new token array, and how many tokens the edit added/removed. It is
the planning statistic for delta-encoding the token store (ship
`(prefix_len, suffix_len, middle)` instead of the full array — the
reference pipeline ships full row images, destination.go RECORD
handling) and for auditing what an update stream actually does to the
corpus.

Scale shape: ONE key-partitioned shuffle (the lag window over
doc_id × lsn — same partitioning the merge stage already uses, so in a
pipeline this reuses the exchange), then per-row O(len) JVM
higher-order functions (zip_with + aggregate). No Python in the row
path, no collect, no global window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _common_run(a: Column, b: Column) -> Column:
    """Length of the longest common prefix of arrays a and b.

    zip_with pads the shorter array with nulls, so a length mismatch
    terminates the run exactly at min(len) without a separate bound:
    the padded positions compare false, and the first false marks the
    end of the run. `array_position` finds it natively (no per-element
    lambda with a struct accumulator — the previous F.aggregate fold
    allocated a two-field struct per element per row, the dominant
    per-row cost of the delta profile); no match means the arrays agree
    through min(len).
    """
    eq = F.zip_with(
        a, b, lambda x, y: x.isNotNull() & y.isNotNull() & (x == y)
    )
    pos = F.array_position(eq, F.lit(False))
    return F.when(pos > 0, (pos - 1).cast("int")).otherwise(
        F.least(F.size(a), F.size(b))
    )


def token_delta(
    log: DataFrame,
    key_col: str = "doc_id",
    lsn_col: str = "change_lsn",
    tokens_col: str = "tokens",
    op_col: str | None = None,
) -> DataFrame:
    """Per consecutive (prev, cur) version pair of each key: prefix_len,
    suffix_len (capped so prefix + suffix never exceeds the shorter
    array — a shrinking edit can't double-count the overlap), and the
    token counts the edit added/removed.

    With `op_col`, pairs that cross a delete are excluded: a delete
    resets the key's history, so the first insert after it has no
    previous version to diff against (same reason the LWW merge treats
    a tombstone as a hard cut, operators/dedup.py).
    """
    w = Window.partitionBy(key_col).orderBy(lsn_col)
    df = log.withColumn("_prev", F.lag(tokens_col).over(w))
    if op_col is not None:
        df = df.withColumn("_prev_op", F.lag(op_col).over(w)).where(
            (F.col(op_col) != "D")
            & F.col("_prev_op").isNotNull()
            & (F.col("_prev_op") != "D")
        )
    df = df.where(F.col("_prev").isNotNull())

    prev, cur = F.col("_prev"), F.col(tokens_col)
    lp, lc = F.size(prev), F.size(cur)
    prefix = _common_run(prev, cur)
    suf_raw = _common_run(F.reverse(prev), F.reverse(cur))
    df = df.select(
        key_col,
        F.col(lsn_col).alias("lsn"),
        lp.alias("len_prev"),
        lc.alias("len_cur"),
        prefix.alias("prefix_len"),
        F.least(suf_raw, F.least(lp, lc) - prefix).alias("suffix_len"),
    )
    return df.select(
        "*",
        (F.col("len_cur") - F.col("prefix_len") - F.col("suffix_len")).alias("added"),
        (F.col("len_prev") - F.col("prefix_len") - F.col("suffix_len")).alias(
            "removed"
        ),
    )


def signed_token_deltas(
    log: DataFrame,
    key_col: str = "doc_id",
    lsn_col: str = "change_lsn",
    tokens_col: str = "tokens",
    op_col: str = "op",
) -> DataFrame:
    """Per version: the tokens it ADDS and REMOVES from the corpus
    multiset, with common prefix/suffix cancelled.

    prev = pre ++ mid_prev ++ suf and cur = pre ++ mid_cur ++ suf share
    `pre` and `suf` exactly (that's what the affix lengths mean), so
    the multiset delta -prev +cur collapses to -mid_prev +mid_cur:
    an update's contribution is proportional to its EDIT size, not its
    document size. History resets add the whole new image; tombstones
    remove the whole previous one. Same single key-partitioned window
    as token_delta.
    """
    w = Window.partitionBy(key_col).orderBy(lsn_col)
    df = log.withColumn("_prev", F.lag(tokens_col).over(w))
    if op_col in log.columns:
        df = df.withColumn("_prev_op", F.lag(op_col).over(w))
        is_del = F.col(op_col) == "D"
        prev_live = F.col("_prev_op").isNotNull() & (F.col("_prev_op") != "D")
    else:
        is_del = F.lit(False)
        prev_live = F.col("_prev").isNotNull()

    elem_type = log.schema[tokens_col].dataType
    empty = F.array().cast(elem_type)
    prev = F.when(prev_live, F.col("_prev")).otherwise(empty)
    cur = F.when(is_del, empty).otherwise(F.coalesce(F.col(tokens_col), empty))
    prefix = _common_run(prev, cur)
    suffix = F.least(
        _common_run(F.reverse(prev), F.reverse(cur)),
        F.least(F.size(prev), F.size(cur)) - prefix,
    )

    def mid(arr):
        n = F.size(arr) - prefix - suffix
        return F.when(n > 0, F.slice(arr, prefix + 1, n)).otherwise(empty)

    return df.select(
        key_col,
        F.col(lsn_col).alias("lsn"),
        mid(cur).alias("added"),
        mid(prev).alias("removed"),
    )


def token_histogram(
    log: DataFrame,
    key_col: str = "doc_id",
    lsn_col: str = "change_lsn",
    tokens_col: str = "tokens",
    op_col: str = "op",
) -> DataFrame:
    """Corpus unigram histogram maintained INCREMENTALLY from the
    change log: fold every version's signed edit (±middle tokens only,
    see signed_token_deltas) into token counts. Equals the histogram
    over the final LWW images — without ever materializing them.

    Scale shape: one key window (shared with the merge stage's
    partitioning) + one token-keyed sum with map-side combine. The
    exploded volume is the total EDIT volume of the log, which delta
    cancellation makes far smaller than total document volume — the
    statistic a vocab/mixture monitor needs per ingest epoch at 10^10
    events without rescanning the table.
    """
    d = signed_token_deltas(log, key_col, lsn_col, tokens_col, op_col)
    signed = F.concat(
        F.transform(
            "added", lambda t: F.struct(t.alias("token"), F.lit(1).alias("w"))
        ),
        F.transform(
            "removed", lambda t: F.struct(t.alias("token"), F.lit(-1).alias("w"))
        ),
    )
    return (
        d.select(F.explode(signed).alias("e"))
        .groupBy(F.col("e.token").alias("token"))
        .agg(F.sum("e.w").alias("cnt"))
        .where(F.col("cnt") != 0)
    )


def delta_encode(
    log: DataFrame,
    key_col: str = "doc_id",
    lsn_col: str = "change_lsn",
    tokens_col: str = "tokens",
    op_col: str = "op",
    full_every: int = 16,
) -> DataFrame:
    """Delta-encode a token-sequence change log: each version ships as
    (kind, prefix_len, suffix_len, middle) instead of its full array.

    kind 'F' (full image, middle = whole array) is emitted for a key's
    first version, the first version after a delete (a tombstone resets
    history, nothing to diff against), and every `full_every`-th
    version — the checkpoint cadence that BOUNDS how long a reconstruct
    chain can get, exactly like binlog periodic snapshots / video
    keyframes. kind 'D' is a tombstone; everything else is kind 'd'
    with middle = tokens[prefix_len+1 .. len-suffix_len] against the
    previous version.

    Same single key-partitioned window as token_delta (one shuffle, the
    merge stage's partitioning); the affix computation is the same
    codegen zip_with/aggregate fold. Lossless by construction —
    delta_reconstruct inverts it; see test_token_delta.py roundtrips.
    """
    w = Window.partitionBy(key_col).orderBy(lsn_col)
    df = log.withColumn("_prev", F.lag(tokens_col).over(w)).withColumn(
        "_rn", F.row_number().over(w)
    )
    if op_col in log.columns:
        df = df.withColumn("_prev_op", F.lag(op_col).over(w))
        is_del = F.col(op_col) == "D"
        reset = F.col("_prev_op").isNull() | (F.col("_prev_op") == "D")
    else:
        is_del = F.lit(False)
        reset = F.lit(False)

    prev, cur = F.col("_prev"), F.col(tokens_col)
    is_full = (
        reset
        | prev.isNull()
        | ((F.col("_rn") - 1) % F.lit(full_every) == 0)
    )
    prefix = F.when(is_full, F.lit(0)).otherwise(_common_run(prev, cur))
    suf_raw = F.when(is_full, F.lit(0)).otherwise(
        _common_run(F.reverse(prev), F.reverse(cur))
    )
    suffix = F.least(suf_raw, F.least(F.size(prev), F.size(cur)) - prefix)
    kind = F.when(is_del, F.lit("D")).when(is_full, F.lit("F")).otherwise(F.lit("d"))
    # middle must be sliced with literal-safe bounds: slice() start of 0
    # is invalid, so full/delete rows short-circuit before slicing
    middle = (
        F.when(is_del, F.lit(None).cast(log.schema[tokens_col].dataType))
        .when(is_full, cur)
        .otherwise(
            F.slice(cur, prefix + 1, F.size(cur) - prefix - suffix)
        )
    )
    return df.select(
        key_col,
        lsn_col,
        kind.alias("kind"),
        F.when(is_del | is_full, F.lit(0)).otherwise(prefix).alias("prefix_len"),
        F.when(is_del | is_full, F.lit(0)).otherwise(suffix).alias("suffix_len"),
        middle.alias("middle"),
    )


def delta_reconstruct(
    encoded: DataFrame,
    key_col: str = "doc_id",
    lsn_col: str = "change_lsn",
) -> DataFrame:
    """Invert delta_encode: the LATEST full token array per key.

    Reads only each key's suffix chain since its last 'F' checkpoint —
    a key-partitioned max aggregate plus a key-co-partitioned join
    prune (both sides hash on the key, AQE reuses the exchange), so
    per-key fold state is bounded by `full_every`, not history length.
    The fold itself is one sort_array(collect_list(...)) + F.aggregate
    over at most full_every structs — JVM codegen, no Python, no
    per-version shuffle. Keys whose last op is a tombstone are absent,
    matching the LWW merge's final state.
    """
    last_full = (
        encoded.where(F.col("kind") == "F")
        .groupBy(key_col)
        .agg(F.max(lsn_col).alias("_last_full_lsn"))
    )
    tail = encoded.join(last_full, key_col).where(
        F.col(lsn_col) >= F.col("_last_full_lsn")
    )
    chain = tail.groupBy(key_col).agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col(lsn_col).alias("lsn"),
                    F.col("kind").alias("kind"),
                    F.col("prefix_len").alias("p"),
                    F.col("suffix_len").alias("s"),
                    F.col("middle").alias("mid"),
                )
            )
        ).alias("_chain"),
        F.max(lsn_col).alias("last_lsn"),
    )
    elem_type = [f.dataType for f in encoded.schema.fields if f.name == "middle"][0]

    def _apply(state, d):
        pre = F.slice(state, F.lit(1), d["p"])
        suf = F.when(
            d["s"] > 0, F.slice(state, -d["s"], d["s"])
        ).otherwise(F.array().cast(elem_type))
        return (
            F.when(d["kind"] == "F", d["mid"])
            .when(d["kind"] == "D", F.lit(None).cast(elem_type))
            .otherwise(F.concat(pre, d["mid"], suf))
        )

    out = chain.select(
        key_col,
        "last_lsn",
        F.aggregate(
            F.col("_chain"), F.lit(None).cast(elem_type), _apply
        ).alias("tokens"),
    )
    return out.where(F.col("tokens").isNotNull()).select(
        key_col, "last_lsn", "tokens", F.size("tokens").alias("n_tok")
    )
