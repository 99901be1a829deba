"""Mergeable sketch family with CROSS-ENGINE-EXACT semantics.

Three sketches a hosted analytics backend keeps per table at 10^10
rows, each built so a DuckDB oracle reproduces the state AND the float
estimates bit-for-bit:

* HyperLogLog (Flajolet et al. 2007) — COUNT(DISTINCT); state is 256
  max-registers per group, max-mergeable.
* Count-min (Cormode & Muthukrishnan 2005) — point frequency upper
  bounds for heavy-hitter queries; state is a d x w counter grid per
  group, sum-mergeable (`cms_state` / `cms_estimate`).
* KMV / theta (Beyer et al. 2007; Dasgupta et al. 2016) — distinct
  cardinality PLUS set algebra (union / intersection / Jaccard across
  sources), which HLL alone cannot give; state is the k smallest
  distinct 60-bit hashes per group, min-k-mergeable (`kmv_sketch` /
  `kmv_estimate` / `kmv_overlap`).

HyperLogLog construction notes:

* the hash is the md5-slice idiom (both engines lowercase-hex md5):
  register index = first 2 hex chars (m = 256), rank = leading-zero
  bits of the next 64 hash bits + 1, computed by STRING arithmetic on
  the hex (strip leading '0's + a 16-way nibble CASE) — no float log,
  no platform intrinsics;
* the estimate's harmonic sum folds the registers in BUCKET ORDER
  (F.aggregate over an array_sort'd collect_list here, an ORDER
  BY-list list_reduce in the oracle), and every term is an exact
  dyadic 2^-r — identical IEEE operation sequence, identical double;
* the raw estimate alpha*m^2/Z is used as-is (no ln-based small-range
  correction: libm ln may differ in the last ulp across engines; with
  m=256 the raw estimator's ~6.5% std error is the documented
  contract, and `n_zero_registers` is emitted so a caller CAN apply
  linear counting itself).

Scale shape: one map-side-combined (group, bucket) max — the sketch IS
the aggregation state, |groups| x 256 rows regardless of input size —
then a |groups|-row fold. Registers are max-mergeable across
partitions, epochs, or tables (test_sketch pins merged == whole), the
property that makes the sketch maintainable under streaming ingest.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

M = 256  # 2^8 registers; std error 1.04/sqrt(m) ~ 6.5%


def _alpha() -> Column:
    # same literal arithmetic both engines constant-fold identically
    return F.lit(0.7213) / (F.lit(1.0) + F.lit(1.079) / F.lit(256.0))


def hll_bucket_rank(col: Column) -> tuple[Column, Column]:
    """(register index, rank) of one value — pure string/int codegen."""
    h = F.md5(F.concat(col.cast("string"), F.lit(":hll")))
    bucket = F.conv(F.substring(h, 1, 2), 16, 10).cast("int")
    rem = F.regexp_replace(F.substring(h, 3, 16), "^0+", "")
    first = F.substring(rem, 1, 1)
    nlz_nibble = (
        F.when(first == "1", 3)
        .when(first.isin("2", "3"), 2)
        .when(first.isin("4", "5", "6", "7"), 1)
        .otherwise(0)
    )
    rank = F.when(F.length(rem) == 0, F.lit(65)).otherwise(
        (F.lit(16) - F.length(rem)) * 4 + nlz_nibble + 1
    )
    return bucket, rank.cast("int")


def hll_registers(
    df: DataFrame, value_col: str, group_cols: list[str]
) -> DataFrame:
    """The sketch state: max rank per (group, register).

    One map-side-combined aggregate; output is bounded by
    |groups| x 256 rows whatever the input size. Registers from
    different partitions/epochs/tables merge by the same groupBy-max.
    """
    bucket, rank = hll_bucket_rank(F.col(value_col))
    return (
        df.select(*group_cols, bucket.alias("bucket"), rank.alias("rank"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rank").alias("r"))
    )


def hll_estimate(registers: DataFrame, group_cols: list[str]) -> DataFrame:
    """Raw HLL estimate per group from the register table.

    Deterministic float fold: registers sorted by bucket, harmonic sum
    accumulated left-to-right, absent registers (rank 0 -> term 1.0)
    added once at the end — the identical operation sequence the DuckDB
    oracle runs, so the double matches bit-for-bit.
    """
    agg = registers.groupBy(*group_cols).agg(
        F.array_sort(F.collect_list(F.struct("bucket", "r"))).alias("_regs"),
        F.count(F.lit(1)).alias("_cnt"),
    )
    z = F.aggregate(
        "_regs",
        F.lit(0.0),
        lambda acc, x: acc + F.pow(F.lit(2.0), -x["r"]),
    ) + (F.lit(M) - F.col("_cnt")).cast("double")
    zeros = (F.lit(M) - F.col("_cnt")).cast("int")
    # linear counting for the small-cardinality range (the standard HLL
    # correction, here emitted ALONGSIDE the raw estimate so the caller
    # picks by the usual E <= 2.5m rule). ln is the one libm call the
    # engines could disagree on by an ulp, so this column is rounded
    # half-up to 4dp — a 1-ulp input difference (~1e-13 absolute here)
    # flips the rounded value only within 1e-13 of a 5e-5 boundary;
    # that tolerance, not bit-equality, is this column's contract.
    lc = F.when(
        zeros > 0,
        F.round(F.lit(256.0) * F.log(F.lit(256.0) / zeros.cast("double")), 4),
    )
    return agg.select(
        *group_cols,
        zeros.alias("n_zero_registers"),
        (_alpha() * M * M / z).alias("hll_estimate"),
        lc.alias("lc_estimate"),
    )


def hll_distinct(
    df: DataFrame, value_col: str, group_cols: list[str]
) -> DataFrame:
    """registers -> estimate in one call (the common read path)."""
    return hll_estimate(hll_registers(df, value_col, group_cols), group_cols)


# ---------------------------------------------------------------------------
# Count-min sketch: point-frequency upper bounds, sum-mergeable.
# ---------------------------------------------------------------------------

CMS_D = 4  # independent hash rows; P(over-est > 2e*N/w) <= e^-d ~ 1.8%
CMS_W = 4096  # 2^12 counters per row (3 hex chars of the md5)


def cms_index(col: Column, row_i: int) -> Column:
    """Counter index of `col` in hash row `row_i` — md5-slice, 0..4095.

    Each row salts the value with a distinct ':cms<i>' suffix, so the d
    rows are independent md5 draws; 3 hex chars give the 2^12 width.
    Pure string/int codegen, identical in the DuckDB oracle
    (('0x' || substr(md5(v || ':cms' || i), 1, 3))::BIGINT).
    """
    h = F.md5(F.concat(col.cast("string"), F.lit(f":cms{row_i}")))
    return F.conv(F.substring(h, 1, 3), 16, 10).cast("int")


def cms_state(
    df: DataFrame, value_col: str, group_cols: list[str]
) -> DataFrame:
    """The sketch state: occurrence count per (group, hash row, index).

    ONE scan of the input, pre-aggregated to exact (group, value)
    counts FIRST (map-side combined, bounded by distinct values per
    group), so the d md5 indexes are computed once per DISTINCT value
    and the grid increments by the weighted count — identical counters
    to hashing every instance (sum of weights = sum of instances,
    pinned in tests/test_sketch.py), at ~|distinct|/|instances| of the
    hash work. On a Zipf token stream that is a ~10x cut in md5 volume,
    and the first shuffle moves only the map-side-combined distinct
    table, not the raw stream. The d indexes are computed as an array
    and posexploded (not d passes); the grid output is bounded by
    |groups| x d x w = |groups| x 16,384 rows whatever the input size.
    States from different partitions, epochs, or tables merge by
    summing counters (groupBy the same key, sum `c` — pinned in
    tests/test_sketch.py), which is what makes the sketch maintainable
    under streaming ingest: each micro-batch contributes its own grid
    and the read path sums.

    Cardinality assumption: the distinct pre-aggregate is a win when
    values repeat (Zipf token streams — the designed workload). On a
    NEAR-UNIQUE value column the first shuffle carries ~|instances|
    rows and the pre-agg is a second exchange for nothing; if such
    inputs matter, hash instances directly (posexplode the idxs off
    the raw stream and skip the (group, value) aggregate).
    """
    vc = df.groupBy(*group_cols, value_col).agg(
        F.count(F.lit(1)).alias("_vc")
    )
    idxs = F.array(
        *[cms_index(F.col(value_col), i) for i in range(CMS_D)]
    )
    return (
        vc.select(
            *group_cols, "_vc", F.posexplode(idxs).alias("row_i", "idx")
        )
        .groupBy(*group_cols, "row_i", "idx")
        .agg(F.sum("_vc").alias("c"))
    )


def cms_estimate(
    state: DataFrame, probes: DataFrame, value_col: str, group_cols: list[str]
) -> DataFrame:
    """Frequency upper bound for each probe value: min over the d rows.

    `probes` carries (group_cols..., value_col) rows — in production the
    candidate set comes from a prior epoch's heavy hitters or an
    external watchlist, never from an exact count (that is the point of
    the sketch). The probe side fans out to d (group, row, idx) keys
    and joins the counter grid; a counter the grid never saw is 0. The
    state is at most |groups| x 16,384 rows, so Spark broadcasts
    whichever side is smaller; the min-fold output is one row per
    probe. Guarantee (pinned in tests): est >= true frequency, always.
    """
    pidx = probes.select(
        *group_cols,
        value_col,
        F.posexplode(
            F.array(*[cms_index(F.col(value_col), i) for i in range(CMS_D)])
        ).alias("row_i", "idx"),
    )
    return (
        pidx.join(state, [*group_cols, "row_i", "idx"], "left")
        .groupBy(*group_cols, value_col)
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("cms_est"))
    )


# ---------------------------------------------------------------------------
# KMV / theta sketch: distinct counts WITH set algebra, min-k-mergeable.
# ---------------------------------------------------------------------------

KMV_K = 256  # retained minima; relative std error ~ 1/sqrt(k-2) ~ 6.3%
TWO60 = 1152921504606846976.0  # 2^60 as an exact double


def kmv_hash(col: Column) -> Column:
    """Uniform 60-bit hash of `col` — 15 hex chars of md5, exact in a
    BIGINT both engines ((:kmv salt keeps it independent of the other
    sketches' draws). 60 bits keeps string->int conversion inside
    int64 in Spark's conv AND DuckDB's ('0x'||...)::BIGINT."""
    h = F.md5(F.concat(col.cast("string"), F.lit(":kmv")))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("long")


def kmv_sketch(
    df: DataFrame, value_col: str, group_cols: list[str], k: int = KMV_K
) -> DataFrame:
    """The sketch state: the k smallest DISTINCT hashes per group.

    Two-phase min-k so no executor ever sorts a full group: the
    distinct hashes are salted into 32 sub-streams (`h % 32` — the
    hash IS uniform, so the salt is too), each sub-stream keeps its
    own k smallest via a windowed row_number over (group, salt), and
    the survivors (<= 32k per group) re-rank globally per group. The
    final state is <= k rows per group with a dense `pos` 1..k.
    Spark 4 additionally pushes a WindowGroupLimit partial top-k below
    the stage-1 exchange, so the salted shuffle itself carries <= k
    rows per salt per map task. The stage-2 window's input is bounded
    at 32k rows per group by construction (a single-partition-window
    warning can appear when `group_cols` are constant-folded literals,
    as in unit tests — it is bounded, not a scale hazard). Callers
    composing several reads over one sketch should persist it — it IS
    the index (<= k rows).

    Min-k states merge: union two sketches' hash sets, keep the k
    smallest distinct — pinned equal to the whole-input sketch in
    tests/test_sketch.py. That is the property that lets per-source or
    per-epoch sketches roll up to corpus level without re-scanning.
    """
    from pyspark.sql.window import Window

    h = df.select(
        *group_cols, kmv_hash(F.col(value_col)).alias("h")
    ).distinct()
    salted = h.withColumn("_salt", (F.col("h") % 32).cast("int"))
    w1 = Window.partitionBy(*group_cols, "_salt").orderBy("h")
    s1 = (
        salted.withColumn("_rn", F.row_number().over(w1))
        .where(F.col("_rn") <= k)
        .drop("_rn", "_salt")
    )
    w2 = Window.partitionBy(*group_cols).orderBy("h")
    return s1.withColumn("pos", F.row_number().over(w2)).where(
        F.col("pos") <= k
    )


def kmv_estimate(
    sketch: DataFrame, group_cols: list[str], k: int = KMV_K
) -> DataFrame:
    """Distinct-count estimate per group from the min-k state.

    A group that filled its sketch estimates (k-1) * 2^60 / h_k (the
    unbiased KMV estimator; h_k = the kth smallest hash, i.e. max of
    the retained set). A group with fewer than k distinct values IS its
    sketch — the count is exact. Both branches are single IEEE ops on
    exactly-representable inputs, so the double matches the oracle
    bit-for-bit (int64 -> double conversion rounds identically in both
    engines).
    """
    agg = sketch.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("_n"), F.max("h").alias("_hk")
    )
    est = F.when(
        F.col("_n") < k, F.col("_n").cast("double")
    ).otherwise(
        F.lit(float(k - 1)) * F.lit(TWO60) / F.col("_hk").cast("double")
    )
    return agg.select(*group_cols, est.alias("kmv_estimate"))


def kmv_overlap(
    sketch_a: DataFrame, sketch_b: DataFrame, k: int = KMV_K
) -> DataFrame:
    """Theta-sketch set algebra over two single-group KMV states
    (columns: h, pos): distinct-of-A, distinct-of-B, union,
    intersection, and Jaccard estimates in ONE row.

    Union rule: theta = the kth smallest hash of S_A ∪ S_B (distinct);
    the retained set is {h < theta} (k-1 hashes). est_union =
    (k-1) * 2^60 / theta, and est_inter counts the hashes BOTH sketches
    retained that fall below theta, scaled by the same 2^60 / theta —
    the standard theta-sketch estimator pair, so jaccard_est is their
    exact-double ratio. Degenerate small inputs (union < k distinct)
    fall back to exact set counts — in exact mode theta conceptually
    covers the whole hash space, so the intersection counts ALL shared
    hashes, not just those strictly below the union max (the strict-<
    cut is a kth-smallest artifact that only exists in full mode; with
    it, two identical singleton sets would report intersection 0).
    Everything here runs over <= 2k rows — the whole point: set
    algebra across 10^10-row sources touches only the sketches.
    """
    a = sketch_a.select(F.col("h").alias("h"))
    b = sketch_b.select(F.col("h").alias("h"))
    uni = a.union(b).distinct().orderBy("h").limit(k)
    stats = uni.agg(
        F.count(F.lit(1)).alias("_n"), F.max("h").alias("theta")
    )
    common = a.join(b, "h").select("h")
    # count-of-common aggregated apart from stats: an EMPTY common set
    # must yield 0, not null out theta/_n via first()-over-empty
    common_cnt = common.crossJoin(stats.select("theta")).agg(
        F.coalesce(
            F.sum(F.when(F.col("h") < F.col("theta"), 1).otherwise(0)),
            F.lit(0),
        ).alias("_n_common_lt"),
        F.count(F.lit(1)).alias("_n_common_all"),
    )
    joined = stats.crossJoin(common_cnt)
    full = F.col("_n") >= k
    scale = F.lit(TWO60) / F.col("theta").cast("double")
    est_a = _kmv_est_df(sketch_a, k, "_est_a")
    est_b = _kmv_est_df(sketch_b, k, "_est_b")
    return (
        joined.crossJoin(est_a)
        .crossJoin(est_b)
        .select(
            F.col("_est_a").alias("est_distinct_a"),
            F.col("_est_b").alias("est_distinct_b"),
            F.when(full, F.lit(float(k - 1)) * scale)
            .otherwise(F.col("_n").cast("double"))
            .alias("est_union"),
            F.when(
                full, F.col("_n_common_lt").cast("double") * scale
            )
            .otherwise(F.col("_n_common_all").cast("double"))
            .alias("est_intersection"),
            F.when(full, F.col("_n_common_lt"))
            .otherwise(F.col("_n_common_all"))
            .cast("int")
            .alias("n_common_retained"),
        )
        .withColumn(
            "jaccard_est",
            F.when(
                F.col("est_union") > 0.0,
                F.col("est_intersection") / F.col("est_union"),
            ).otherwise(F.lit(0.0)),
        )
    )


def _kmv_est_df(sketch: DataFrame, k: int, alias: str) -> DataFrame:
    """1-row distinct estimate of one sketch, under `alias`."""
    agg = sketch.agg(F.count(F.lit(1)).alias("_sn"), F.max("h").alias("_hk"))
    est = F.when(F.col("_sn") < k, F.col("_sn").cast("double")).otherwise(
        F.lit(float(k - 1)) * F.lit(TWO60) / F.col("_hk").cast("double")
    )
    return agg.select(est.alias(alias))


# ---------------------------------------------------------------------------
# HDR histogram sketch: quantiles over nonnegative ints, sum-mergeable.
# ---------------------------------------------------------------------------
#
# The quantile member of the family (HdrHistogram, Gil Tene; same
# exponential-bucket idea as DDSketch, Masson et al. VLDB 2019), built
# ALL-INTEGER so the DuckDB oracle reproduces state and estimates
# exactly — no libm log, no float bucketing:
#
# * values 0..31 get exact unit bins (bin = v);
# * a value with bit length blen >= 6 lands in one of 16 linear
#   sub-buckets of its power-of-two range:
#     bin = 32 + (blen-6)*16 + (v - 2^(blen-1)) div 2^(blen-5)
#   (bit length via the binary-string length — Spark conv(v,10,2),
#   DuckDB to_base(v,2) — integer compare/divide everywhere; 2^e comes
#   from pow(2.0,e) which is an exact double for e <= 53, cast back).
# * binning is monotone in v, so bin order IS value order and rank
#   queries walk the cumulative histogram.
#
# State: count per (group, bin) — at most 32 + 58*16 = 960 bins per
# group for the whole 0..2^53 domain, whatever the input size, and
# sum-mergeable across partitions / epochs / tables (the same agg_spec
# `sum` rule the lake's aggregate engine already runs, so the sketch
# can live as engine state like the HLL registers and CMS grid).
# Reading a quantile returns the bin's integer midpoint: relative
# error <= (w/2)/2^(blen-1) = 1/32 ~ 3.2% for v >= 32, exact below.
#
# Domain contract: 0 <= v < 2^53. Inside it every double cast in the
# bin/rep arithmetic is exact (longs < 2^53 round-trip; dividing an
# exact double by a power of two only changes the exponent), so the
# floor-div compiles to plain codegen yet never rounds.

HDR_CUTOFF = 32  # unit bins below; 16 sub-buckets per octave above


def _p2(e: Column) -> Column:
    """2^e as an exact BIGINT (pow(2.0, e) is exact for e <= 53)."""
    return F.pow(F.lit(2.0), e).cast("long")


def hdr_bin(col: Column) -> Column:
    """Bin id of one nonnegative integer — monotone, pure codegen."""
    blen = F.length(F.conv(col.cast("string"), 10, 2))
    sub = F.floor(
        (col - _p2(blen - 1)).cast("double") / _p2(blen - 5)
    ).cast("long")
    coded = F.lit(32) + (blen - 6).cast("long") * 16 + sub
    return F.when(col < HDR_CUTOFF, col.cast("long")).otherwise(coded)


def hdr_rep(bin_col: Column) -> Column:
    """The integer midpoint a bin reports for any rank landing in it:
    lo + w/2 where lo = 2^(blen-1) + sub*w, w = 2^(blen-5); exact
    value for the unit bins below 32."""
    e = F.floor((bin_col - 32).cast("double") / 16).cast("int")  # blen-6
    sub = (bin_col - 32) % 16
    mid = _p2(e + 5) + sub * _p2(e + 1) + _p2(e)
    return F.when(bin_col < HDR_CUTOFF, bin_col).otherwise(mid)


def hdr_state(
    df: DataFrame, value_col: str, group_cols: list[str]
) -> DataFrame:
    """The sketch state: occurrence count per (group, bin).

    One map-side-combined count; output bounded by |groups| x 960 rows
    whatever the input size. States from different partitions, epochs,
    or tables merge by summing counts (pinned in tests/test_sketch.py),
    which is what lets the lake's aggregate engine (agg_spec c: sum)
    maintain it under streaming ingest exactly like the CMS grid.
    """
    return (
        df.select(*group_cols, hdr_bin(F.col(value_col)).alias("bin"))
        .groupBy(*group_cols, "bin")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def hdr_quantiles(
    state: DataFrame,
    group_cols: list[str],
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Per-group rank queries off the histogram state: for each q the
    midpoint of the bin containing the rank-ceil(q*n) value (the type-1
    discrete quantile's bin — binning is monotone, so the cumulative
    walk lands exactly there). Output: group_cols, n_rows, p<q>_est...

    The window runs over the STATE (<= 960 rows per group), never the
    input; ceil(q*n) is one IEEE multiply on an exactly-representable
    long, identical in the oracle.
    """
    from pyspark.sql.window import Window

    wcum = (
        Window.partitionBy(*group_cols)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy(*group_cols)
    cum = state.withColumn("cum", F.sum("c").over(wcum)).withColumn(
        "n", F.sum("c").over(wall)
    )
    rep = hdr_rep(F.col("bin"))
    aggs = [
        F.min(
            F.when(
                F.col("cum") >= F.ceil(F.lit(float(q)) * F.col("n")), rep
            )
        ).alias(f"p{int(round(q * 100))}_est")
        for q in qs
    ]
    return cum.groupBy(*group_cols).agg(
        F.max("n").alias("n_rows"), *aggs
    )
