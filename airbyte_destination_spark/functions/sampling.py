"""Deterministic sampling / splitting / packing for training pipelines.

The reference connector moves records; a training-data pipeline built
on the same table also needs the standard corpus-preparation operators:
a stable train/validation split, per-source mixture weighting, and
sequence packing into fixed-size context windows. All three are pure
JVM expressions (no UDFs, no RNG state): randomness comes from md5 of
the row key, so the same row always lands in the same split/sample at
any parallelism and any scale — and the DuckDB oracle reproduces every
decision bit-for-bit (md5 is the one hash both engines share; the
minhash family uses the same trick, see textdedup.py).

Scale notes:
- split / mixture are stateless per-row filters — they fuse into the
  scan (predicate pushdown applies) and shuffle nothing.
- packing needs a running sum, i.e. a window. A GLOBAL ordered window
  is a single-partition plan — the classic scale killer — so packing
  is per-shard (PARTITION BY a coarse column like `source`): each
  shard packs independently in parallel, which is exactly how
  production packers shard the stream. Shard-relative bin ids are
  globally unique when prefixed with the shard key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# 24 hex chars < 2^96; through double division the ratio is uniform
# enough for splitting (md5 slice idiom shared with the DuckDB oracle)
_U01_HEX_CHARS = 6
_U01_DENOM = float(16 ** _U01_HEX_CHARS)


def hash_u01(col, salt: str):
    """Deterministic uniform [0,1) from md5(col || ':' || salt).

    First 6 hex chars -> 24-bit int -> /2^24. Reproducible verbatim in
    DuckDB: CAST(from_hex? no — conv(substr(md5(..),1,6),16,10)) —
    both engines lowercase-hex md5, so the slice matches exactly.
    """
    h = F.md5(F.concat(col.cast("string"), F.lit(":" + salt)))
    return F.conv(F.substring(h, 1, _U01_HEX_CHARS), 16, 10).cast("double") / F.lit(
        _U01_DENOM
    )


def train_val_split(
    df: DataFrame,
    id_col: str = "doc_id",
    val_frac: float = 0.1,
    seed: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Stable hash split: a row's assignment depends only on (id, seed).

    Adding/removing other rows, repartitioning, or rescaling the corpus
    never moves a row across the split boundary — the property random
    sampling lacks and every training pipeline needs for leakage-free
    eval sets.
    """
    u = hash_u01(F.col(id_col), seed)
    return df.withColumn(
        out_col, F.when(u < F.lit(val_frac), F.lit("val")).otherwise(F.lit("train"))
    )


def mixture_sample(
    df: DataFrame,
    weights: dict[str, float],
    source_col: str = "source",
    id_col: str = "doc_id",
    seed: str = "mix",
) -> DataFrame:
    """Per-source weighted downsampling (data-mixture construction).

    Keeps a row iff u01(id) < weight[source]; sources absent from
    `weights` are dropped. Stateless filter — fuses into the scan, no
    shuffle, exact same keep-set at any parallelism.
    """
    u = hash_u01(F.col(id_col), seed)
    w = F.lit(0.0)
    for src, frac in sorted(weights.items()):
        w = F.when(F.col(source_col) == src, F.lit(float(frac))).otherwise(w)
    return df.where(u < w)


def pack_sequences(
    df: DataFrame,
    len_col: str = "n_tok",
    context_len: int = 2048,
    shard_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Concat-then-chunk sequence packing (per shard).

    Sequences are laid end-to-end in (shard, id) order; the stream is
    cut into fixed `context_len` windows. Returns per row: its byte/token
    offset in the shard stream, the context bin its FIRST token lands
    in, and how many bins it spans (a long document may straddle
    several windows). The window is PARTITIONed by the shard column so
    each shard packs in parallel — no global ordering, no
    single-partition exchange.
    """
    w = (
        Window.partitionBy(shard_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    end_off = F.sum(F.col(len_col)).over(w).cast("long")
    start_off = (end_off - F.col(len_col)).cast("long")
    return df.select(
        shard_col,
        id_col,
        F.col(len_col).alias("seq_len"),
        start_off.alias("offset"),
        F.floor(start_off / F.lit(context_len)).cast("long").alias("bin_id"),
        (
            F.floor((end_off - F.lit(1)) / F.lit(context_len))
            - F.floor(start_off / F.lit(context_len))
            + F.lit(1)
        )
        .cast("long")
        .alias("bins_spanned"),
    )


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    seed: str = "wsample",
    key_col: str = "race_key",
) -> DataFrame:
    """Fixed-SIZE weighted sample (hash-rank top-k) — the corpus-budget
    selector: "give me exactly k documents, favoring heavy weights",
    e.g. a token-budgeted pretraining subset where w = doc length or an
    importance weight. Complements `mixture_sample` (per-row keep RATE,
    output size varies) and `dsir_resample` (Bernoulli on a score).

    Efraimidis–Spirakis-style race, made deterministic and cross-engine
    exact: each row gets key u/w (u = 24-bit md5 uniform from the row
    id, exact integer/2^24) and the k SMALLEST keys win. u/w is the
    first-order surrogate of the exponential race (-ln(u)/w ~ Exp(w),
    inclusion P -> w_i/Σw as winning keys concentrate near 0): for the
    ranks that matter (small u/w) the CDFs agree to O(t²), and unlike
    ln/pow it uses only exactly-rounded IEEE ops — an integer-valued
    numerator divided by the weight — so the DuckDB oracle reproduces
    the selected SET and every key bit-for-bit (libm last-ulp drift in
    ln() could otherwise flip the boundary rank). Ties (same u AND same
    w) break on the id.

    Scale shape: stateless projection + TakeOrderedAndProject — each
    partition keeps a local k-heap and the driver merges k-sized heaps;
    no global sort, no corpus shuffle, driver state O(k).
    """
    u = hash_u01(F.col(id_col), seed)
    key = u / F.col(weight_col).cast("double")
    return (
        df.where(F.col(weight_col) > 0)
        .withColumn(key_col, key)
        .orderBy(key_col, id_col)
        .limit(k)
    )


def epoch_shuffle(
    df: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    seed: str = "epoch0",
) -> DataFrame:
    """Deterministic global training-order shuffle: every row gets a
    stable (shard, pos) derived from md5(id || seed) — the reproducible
    shuffle a training run needs (identical order at any parallelism or
    corpus partitioning; a new epoch seed is a fresh permutation;
    adding documents perturbs only their insertion points, never
    reshuffles the survivors' relative order).

    Physical shape: ONE hash exchange on the shard id plus an
    in-partition sort — never a global ORDER BY (whose range exchange +
    final single-ordered-stream write would bottleneck a 10^10-row
    corpus). Readers consume shard files independently and shard-local
    order is the contract, exactly how training data loaders shard.
    """
    h = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(":" + seed)))
    hv = F.conv(F.substring(h, 1, _U01_HEX_CHARS), 16, 10).cast("long")
    from pyspark.sql import Window

    w = Window.partitionBy("shard").orderBy("_h", id_col)
    return (
        df.withColumn("_h", h)
        .withColumn("shard", (hv % F.lit(n_shards)).cast("int"))
        .withColumn("pos", F.row_number().over(w))
        .drop("_h")
    )


def dsir_logratio(
    df: DataFrame,
    target_pred,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.5,
) -> DataFrame:
    """DSIR-style importance weight (Xie et al. 2023, "Data Selection
    with Importance Resampling"): score every document by the mean
    per-token log-ratio of an in-domain TARGET unigram model over the
    RAW-corpus unigram model, both add-alpha smoothed. Positive score
    means the document looks like the target domain; sampling with
    probability proportional to exp(score) is importance resampling.
    ``target_pred`` is a boolean Column marking the target rows
    (e.g. `F.col("lang") == "en"`); the raw model is the whole input.

      lr(w) = ln((c_t(w)+a)/(N_t+a·V)) − ln((c_r(w)+a)/(N_r+a·V))

    Plan shape (the tfidf/lm_perplexity lesson applied): ONE word-keyed
    count aggregate serves both models (conditional sum for the target
    side — the target corpus is a subset, so one pass suffices); the
    per-word table joins back to the doc word stream with a plain
    SHUFFLE join on the word — never broadcast, a web vocabulary is
    10^8+ rows. Totals ride in as a 1-row cross join. Per-doc score is
    round(avg(lr), 6) (same FP-jitter absorption as lm_perplexity, and
    mean rather than sum keeps the score length-invariant).

    Returns (doc_id, n_words, dsir_score); empty docs carry NULL score.
    """
    # _pos_words minus the position column, carrying the target flag
    words = df.select(
        F.col(id_col),
        target_pred.cast("int").alias("_is_t"),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("w"),
    ).where(F.col("w") != "")
    # one shuffle: raw count + conditional target count per word
    vocab = words.groupBy("w").agg(
        F.count(F.lit(1)).alias("c_r"),
        F.sum("_is_t").alias("c_t"),
    )
    totals = vocab.agg(
        F.sum("c_r").alias("n_r"),
        F.sum("c_t").alias("n_t"),
        F.count(F.lit(1)).alias("_v"),
    )
    lr = F.log(
        (F.col("c_t") + F.lit(alpha)) / (F.col("n_t") + F.lit(alpha) * F.col("_v"))
    ) - F.log(
        (F.col("c_r") + F.lit(alpha)) / (F.col("n_r") + F.lit(alpha) * F.col("_v"))
    )
    scored = (
        words.join(vocab.hint("shuffle_hash"), "w")
        .crossJoin(totals)
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.round(F.avg(lr), 6).alias("dsir_score"),
        )
    )
    return (
        df.select(F.col(id_col)).distinct()
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_words", F.lit(0)).cast("long").alias("n_words"),
            "dsir_score",
        )
    )


def dsir_resample(
    df: DataFrame,
    target_pred,
    salt: str = "dsir",
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.5,
) -> DataFrame:
    """The resampling step completing DSIR: keep each document with
    probability sigmoid(dsir_score) using the deterministic md5 coin
    (hash_u01) — the same document gets the same verdict at any
    parallelism, and the DuckDB oracle replays every decision.

    keep_prob is rounded to 6 dp BEFORE the comparison: libm exp() may
    differ in the last ulp across engines, and the u01 coin's grid is
    2^-24 (~6e-8), so a 1e-6-rounded probability cannot flip a verdict
    between engines unless exp() diverges by >5e-7 relative (it
    doesn't). Docs with a NULL score (no tokens) are never kept.

    Output: (doc_id, dsir_score, keep_prob, keep) — the score and coin
    surface so a pipeline can re-threshold or re-temperature without
    recomputing the models.
    """
    scored = dsir_logratio(
        df, target_pred, id_col=id_col, text_col=text_col, alpha=alpha
    )
    prob = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("dsir_score"))), 6)
    u = hash_u01(F.col(id_col), salt)
    return scored.select(
        id_col,
        "dsir_score",
        prob.alias("keep_prob"),
        F.when(F.col("dsir_score").isNull(), F.lit(False))
        .otherwise(u < prob)
        .alias("keep"),
    )


def fim_transform(
    df: DataFrame,
    tokens_col: str = "tokens",
    key_col: str = "doc_id",
    rate: float = 0.5,
    prefix_tok: int = 50000,
    suffix_tok: int = 50001,
    middle_tok: int = 50002,
    salt: str = "fim",
) -> DataFrame:
    """Fill-in-the-middle transformation of pre-tokenized sequences
    (Bavarian et al. 2022, "Efficient Training of Language Models to
    Fill in the Middle") — the standard code/LM augmentation a release
    pipeline applies to a deterministic fraction of documents: two cut
    points split the sequence into (prefix, middle, suffix), re-emitted
    in PSM layout

        [PRE] prefix [SUF] suffix [MID] middle

    with sentinel token ids outside the vocabulary. The untransformed
    rest passes through unchanged, flagged by `fim_applied`.

    Pure JVM expressions end to end (size/slice/concat — no UDF, no
    shuffle: the transform fuses into the scan like the other sampling
    ops). Selection and both cut points come from md5 of the row key,
    so the same document gets the same transform at any parallelism —
    and the DuckDB oracle replays every decision bit-for-bit. Cut
    points are drawn uniformly from 0..n inclusive, so empty prefix /
    middle / suffix segments are legal (matching the paper's
    character-level uniform splits); slice with length 0 yields [] in
    both engines.
    """
    n = F.size(F.col(tokens_col))
    key = F.col(key_col).cast("string")
    sel = hash_u01(F.col(key_col), salt + ":r") < F.lit(rate)

    def cut(tag: str):
        h = F.md5(F.concat(key, F.lit(f":{salt}:{tag}")))
        return F.conv(F.substring(h, 1, 6), 16, 10).cast("long") % (
            n.cast("long") + 1
        )

    a, b = cut("a"), cut("b")
    lo = F.least(a, b).cast("int")
    hi = F.greatest(a, b).cast("int")
    toks = F.col(tokens_col)
    fimmed = F.concat(
        F.array(F.lit(prefix_tok)),
        F.slice(toks, 1, lo),
        F.array(F.lit(suffix_tok)),
        F.slice(toks, hi + 1, n - hi),
        F.array(F.lit(middle_tok)),
        F.slice(toks, lo + 1, hi - lo),
    )
    return df.withColumn("fim_applied", sel).withColumn(
        tokens_col, F.when(sel, fimmed).otherwise(toks)
    )
