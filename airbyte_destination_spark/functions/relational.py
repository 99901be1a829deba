"""Multi-way dimensional joins and set operations.

SURVEY §2 lists the relational-operator categories the reference
delegates to its hosted warehouse (ClickHouse) rather than
implementing: "joins of any kind … set ops". Every other delegated
category already has a first-class query in this engine (aggregation /
grouping sets → cube_rollup, windows → topk_per_group/scd2, sorts /
top-k → leaderboard, scalar functions → throughout). This module
closes the remaining two with the canonical warehouse shapes, written
for the plan you'd want at 100 TB rather than the first one that runs.

Scale notes:

- ``regional_supplier_volume`` (the TPC-H Q5 shape): the fact table
  (lineitem) and the two large entity tables (orders, customer) join
  on their keys via ordinary hash-exchange joins — at web scale
  orders/customer are 10^9-row tables and MUST NOT be broadcast; AQE
  promotes them to broadcast automatically when a filter makes them
  small enough, so hinting them would only remove that freedom. The
  constant-size dimensions (nation: ≤ a few hundred rows, region: a
  handful) are explicitly ``F.broadcast`` so the nation/region hops
  never shuffle the fact stream. The date filter sits directly on the
  orders scan (pushed to parquet row groups) so the fact join starts
  from the pruned side, and the region filter prunes the broadcast
  side before the join. Supplier joins by key without a hint for the
  same reason as customer (TPC-H supplier is SF×10k rows — 10^9 at
  web scale); at test SF it auto-broadcasts.
- ``cohort_setops``: INTERSECT / EXCEPT between two keyed sets is ONE
  full-outer join of the two distinct sides with a membership label —
  each side pays exactly one key exchange for its distinct and the
  join reuses that partitioning (Catalyst sees both children
  hash-partitioned on the key ⇒ no third exchange). The literal
  ``df.intersect`` / ``df.exceptAll`` composition plans three
  aggregate+join pairs over the same inputs (each side scanned and
  shuffled up to 3×); the single full-outer emits all three labels in
  one pass. tests/test_relational.py pins the equivalence of the two
  formulations and the plan shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def regional_supplier_volume(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    region_name: str,
    date_from: str,
    date_to: str,
) -> DataFrame:
    """Revenue per nation from LOCAL supply chains (customer and
    supplier in the same nation) within one region and date window —
    the 6-table dimensional-join benchmark shape (TPC-H Q5).

    Returns (nation, n_items, revenue) with revenue = sum of
    l_extendedprice * (1 - l_discount) rounded to 4dp (the shared
    engine-stable rounding idiom), ordered columns only — row order is
    left to the caller.
    """
    o = orders.where(
        (F.col("o_orderdate") >= F.lit(date_from).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(date_to).cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    n = nation.select("n_nationkey", "n_name", "n_regionkey")
    r = region.where(F.col("r_name") == region_name).select("r_regionkey")
    joined = (
        lineitem.select(
            "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
        )
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            customer.select("c_custkey", "c_nationkey"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            supplier.select("s_suppkey", "s_nationkey"),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return joined.groupBy(F.col("n_name").alias("nation")).agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
        ).alias("revenue"),
    )


def promo_revenue(
    lineitem: DataFrame,
    part: DataFrame,
    promo_type: str = "PROMO",
) -> DataFrame:
    """Monthly share of revenue from promo-class parts (TPC-H Q14):
    100 * sum(revenue where p_type = promo) / sum(revenue) per
    ship month.

    Scale shape: part is a 10^8-row entity table at web scale, so the
    fact join is a plain key exchange on partkey (AQE promotes it to
    broadcast at test SF where it fits); the promo flag reduces to a
    conditional aggregate so both sums come out of ONE shuffle. The
    ratio divides two full-precision sums and rounds to 6dp — at ~10^3
    terms per month the cross-engine sum drift is ~1e-13 relative,
    orders of magnitude inside the rounding (same analysis as
    rollup_daily's 4dp sums).
    """
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    month = F.unix_millis(F.date_trunc("month", F.col("l_shipdate")))
    j = lineitem.select(
        F.col("l_partkey"), rev.alias("_rev"), month.alias("month_ms")
    ).join(
        part.select("p_partkey", "p_type"),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    promo = F.sum(F.when(F.col("p_type") == promo_type, F.col("_rev")).otherwise(F.lit(0.0)))
    total = F.sum("_rev")
    return j.groupBy("month_ms").agg(
        F.round(F.lit(100.0) * promo / total, 6).alias("promo_pct"),
        F.round(total, 4).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


def register_bucketed(
    spark: SparkSession,
    df: DataFrame,
    name: str,
    bucket_col: str,
    n_buckets: int,
    path: str,
) -> DataFrame:
    """Materialize ``df`` as a Spark-catalog BUCKETED table (external,
    files at ``path``) and return the catalog-backed handle.

    This is the storage-clustered-join technique (Hive bucketing /
    Iceberg storage-partitioned joins): the files are hash-clustered
    on ``bucket_col`` at WRITE time and the layout is recorded in the
    catalog, so every later equi-join or aggregation on that key reads
    co-located splits — Catalyst sees both children already
    hash-distributed and plans the join with ZERO shuffle exchanges
    (pinned in tests/test_plans.py). At 100 TB this is the difference
    between re-shuffling two fact tables on every query and never
    shuffling them again; the one-time clustering cost is paid here,
    at write. ``sortBy`` additionally orders rows within each bucket
    file so a single-file bucket skips the sort below a sort-merge
    join. Same-key tables must use the same ``n_buckets`` (or a
    multiple, with bucket coalescing enabled) to co-locate.

    The lake's own tables already cluster their buckets this way for
    the CDC merge path (lake/table.py bucket_expr); this helper extends
    the property to ad-hoc analytical tables via the session catalog.
    """
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    (
        df.write.mode("overwrite")
        .option("path", path)
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .saveAsTable(name)
    )
    return spark.table(name)


def colocated_revenue_by_priority(
    lineitem_b: DataFrame, orders_b: DataFrame
) -> DataFrame:
    """Revenue per order priority over two co-bucketed tables — the
    fact-to-fact join (lineitem ⋈ orders on orderkey) that at web
    scale joins two 10^9+-row tables and must NOT pay a shuffle per
    query. Both inputs come from ``register_bucketed`` on the same key
    and bucket count, so the join planwise costs zero exchanges; the
    only shuffle left is the 5-row priority aggregate.

    Returns (o_orderpriority, n_items, revenue) with revenue rounded
    to 4dp (the shared engine-stable rounding idiom).
    """
    j = lineitem_b.select(
        "l_orderkey", "l_extendedprice", "l_discount"
    ).join(
        orders_b.select("o_orderkey", "o_orderpriority"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    return j.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
        ).alias("revenue"),
    )


def cohort_setops(
    orders: DataFrame,
    split_date: str,
    key_col: str = "o_custkey",
    ts_col: str = "o_orderdate",
) -> DataFrame:
    """Set membership of two keyed cohorts in one pass: customers
    active before vs at-or-after ``split_date``.

    Returns (custkey, cohort) where cohort ∈ {'both', 'first_only',
    'second_only'} — semantically INTERSECT, EXCEPT, and reverse
    EXCEPT of the two distinct key sets, produced by ONE full-outer
    join instead of three aggregate+semijoin plans (see module
    docstring).
    """
    split = F.lit(split_date).cast("timestamp")
    first = (
        orders.where(F.col(ts_col) < split).select(F.col(key_col).alias("_f")).distinct()
    )
    second = (
        orders.where(F.col(ts_col) >= split)
        .select(F.col(key_col).alias("_s"))
        .distinct()
    )
    return (
        first.join(second, F.col("_f") == F.col("_s"), "full_outer")
        .select(
            F.coalesce(F.col("_f"), F.col("_s")).alias("custkey"),
            F.when(F.col("_f").isNotNull() & F.col("_s").isNotNull(), "both")
            .when(F.col("_s").isNull(), "first_only")
            .otherwise("second_only")
            .alias("cohort"),
        )
    )
