"""Mergeable distinct-count sketches with CROSS-ENGINE-EXACT semantics.

HyperLogLog (Flajolet et al. 2007) as the reference's hosted analytics
would serve COUNT(DISTINCT) at 10^10 scale — but built so a DuckDB
oracle reproduces the sketch BIT-FOR-BIT, registers and float estimate
alike:

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
