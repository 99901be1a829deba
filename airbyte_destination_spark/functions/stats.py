"""Exact distributed order statistics.

Spark's built-in exact ``percentile`` buffers every value of a group in
one aggregation buffer (ObjectHashAggregate) — fine for small groups,
an executor OOM when one group holds 10^9 rows. This module computes
EXACT linear-interpolated quantiles (the ``quantile_cont`` definition
DuckDB/Postgres use, identical to Hive/Spark ``percentile``) with a plan
whose per-group state is the number of DISTINCT values, not the number
of rows:

  1. histogram: groupBy(group, value) count — map-side combined, the
     only scan-sized shuffle;
  2. cumulative ranks: a window over the histogram rows (distinct
     values per group — bounded for discrete measures like document
     lengths);
  3. rank arithmetic: target position r = q*(N-1)+1; the value at rank
     k is min(v where cum >= k); interpolate between floor(r) and
     floor(r)+1.

Reference frame: the reference connector delegates all analytics to its
hosted warehouse; percentile latency/length dashboards are the standard
downstream use.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def quantiles_exact(
    df: DataFrame,
    value_col: str,
    group_col: str,
    qs: Sequence[float] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Per-group exact quantile_cont for each q in ``qs`` plus n_rows
    and mean. Output: (group_col, n_rows, mean, p<q*100>...), quantiles
    rounded to 6 dp (matching the DuckDB oracle expression).
    """
    hist = df.groupBy(group_col, value_col).agg(F.count(F.lit(1)).alias("cnt"))
    wcum = (
        Window.partitionBy(group_col)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    hist = hist.withColumn("cum", F.sum("cnt").over(wcum))

    totals = df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.avg(value_col), 6).alias("mean"),
    )

    # (group, q, floor(target rank), frac) — n_groups x len(qs) rows.
    positions = (
        totals.select(group_col, "n_rows")
        .select(
            group_col,
            "n_rows",
            F.explode(F.array(*[F.lit(float(q)) for q in qs])).alias("q"),
        )
        .withColumn("r", F.col("q") * (F.col("n_rows") - 1) + 1)
        .withColumn("fl", F.floor("r").cast("long"))
        .withColumn("frac", F.col("r") - F.col("fl"))
        .select(group_col, "q", "fl", "frac")
    )

    # value at rank k = min(v) among histogram rows with cum >= k; the
    # positions side is n_groups x n_qs rows — genuinely broadcastable.
    joined = hist.join(F.broadcast(positions), group_col)
    at = joined.groupBy(group_col, "q", "frac").agg(
        F.min(F.when(F.col("cum") >= F.col("fl"), F.col(value_col))).alias("vf"),
        F.min(F.when(F.col("cum") >= F.col("fl") + 1, F.col(value_col))).alias("vc"),
    )
    quant = at.select(
        group_col,
        "q",
        F.round(
            F.when(F.col("frac") == 0, F.col("vf").cast("double")).otherwise(
                F.col("vf") + F.col("frac") * (F.col("vc") - F.col("vf"))
            ),
            6,
        ).alias("val"),
    )
    wide = quant.groupBy(group_col).pivot(
        "q", [float(q) for q in qs]
    ).agg(F.first("val"))
    renamed = wide.select(
        group_col,
        *[F.col(f"`{float(q)}`").alias(f"p{int(round(q * 100))}") for q in qs],
    )
    return totals.join(renamed, group_col)
