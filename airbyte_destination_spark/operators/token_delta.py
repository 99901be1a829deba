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
    terminates the run exactly at min(len) without a separate bound;
    the aggregate carries (run, still_matching) and stops counting at
    the first inequality.
    """
    eq = F.zip_with(
        a,
        b,
        lambda x, y: F.when(
            x.isNotNull() & y.isNotNull() & (x == y), F.lit(1)
        ).otherwise(F.lit(0)),
    )
    return F.aggregate(
        eq,
        F.struct(F.lit(0).alias("run"), F.lit(True).alias("ok")),
        lambda acc, x: F.struct(
            (acc["run"] + F.when(acc["ok"] & (x == 1), 1).otherwise(0)).alias("run"),
            (acc["ok"] & (x == 1)).alias("ok"),
        ),
        lambda acc: acc["run"],
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
