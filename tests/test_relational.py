"""Multi-way dimensional join + set operations (functions/relational.py).

These close the last two relational categories SURVEY §2 lists as
delegated to the reference's warehouse: joins of any kind, set ops.
"""

import pytest
from pyspark.sql import functions as F

from airbyte_destination_spark.functions.relational import (
    cohort_setops,
    regional_supplier_volume,
)
from airbyte_destination_spark.plans import count_exchanges, executed_plan

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def tpch(spark):
    return {
        t: spark.read.parquet(f"{SF_DIR}/{t}.parquet")
        for t in ("lineitem", "orders", "customer", "supplier", "nation", "region")
    }


def _q5(tpch, **kw):
    args = dict(region_name="ASIA", date_from="1996-01-01", date_to="1998-01-01")
    args.update(kw)
    return regional_supplier_volume(
        tpch["lineitem"],
        tpch["orders"],
        tpch["customer"],
        tpch["supplier"],
        tpch["nation"],
        tpch["region"],
        **args,
    )


def test_regional_volume_matches_naive_sql(spark, tpch):
    for t, df in tpch.items():
        df.createOrReplaceTempView(f"rv_{t}")
    expected = {
        (r["nation"], r["n_items"], r["revenue"])
        for r in spark.sql(
            """
            SELECT n_name AS nation, count(*) AS n_items,
                   round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
            FROM rv_lineitem
            JOIN rv_orders   ON l_orderkey = o_orderkey
            JOIN rv_customer ON o_custkey = c_custkey
            JOIN rv_supplier ON l_suppkey = s_suppkey
                            AND c_nationkey = s_nationkey
            JOIN rv_nation   ON s_nationkey = n_nationkey
            JOIN rv_region   ON n_regionkey = r_regionkey
            WHERE r_name = 'ASIA'
              AND o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate <  TIMESTAMP '1998-01-01'
            GROUP BY n_name
            """
        ).collect()
    }
    got = {(r["nation"], r["n_items"], r["revenue"]) for r in _q5(tpch).collect()}
    assert got == expected
    assert got  # non-degenerate at sf0.001


def test_regional_volume_plan_shape(tpch):
    """Nation and region ride broadcast exchanges; no cartesian product;
    the orders date filter reaches the parquet scan."""
    plan = executed_plan(_q5(tpch))
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # date filter pushed to the orders scan (shows up as PushedFilters
    # on the scan node in the executed plan text)
    assert "o_orderdate" in plan.split("Scan parquet")[1] or "PushedFilters" in plan


def test_cohort_setops_equals_setop_composition(spark, tpch):
    """The one-pass full-outer labeling equals the literal
    INTERSECT / EXCEPT / reverse-EXCEPT composition."""
    orders = tpch["orders"]
    split = F.lit("1998-04-25").cast("timestamp")
    first = orders.where(F.col("o_orderdate") < split).select("o_custkey").distinct()
    second = orders.where(F.col("o_orderdate") >= split).select("o_custkey").distinct()
    expected = {
        (r[0], "both") for r in first.intersect(second).collect()
    } | {
        (r[0], "first_only") for r in first.exceptAll(second).collect()
    } | {
        (r[0], "second_only") for r in second.exceptAll(first).collect()
    }
    got = {(r["custkey"], r["cohort"]) for r in cohort_setops(orders, "1998-04-25").collect()}
    assert got == expected
    labels = {c for _, c in got}
    assert "both" in labels  # non-degenerate split


def test_cohort_setops_single_pass_plan(tpch):
    """Each side pays one distinct exchange and the full-outer join
    reuses that partitioning: ≤2 shuffle exchanges total (the literal
    3-set-op composition plans ≥6)."""
    df = cohort_setops(tpch["orders"], "1998-04-25")
    assert count_exchanges(df) <= 2


def test_promo_revenue_one_exchange_pair_and_conditional_agg(spark, tpch):
    """Both sums come out of one aggregate after one partkey join; no
    second scan of lineitem for the promo side."""
    from airbyte_destination_spark.functions.relational import promo_revenue

    part = spark.read.parquet(f"{SF_DIR}/part.parquet")
    df = promo_revenue(tpch["lineitem"], part)
    plan = executed_plan(df)
    assert plan.count("Scan parquet") == 2  # lineitem once, part once
    rows = {r["month_ms"]: r for r in df.collect()}
    # cross-check one month against a direct computation
    tpch["lineitem"].createOrReplaceTempView("pr_l")
    part.createOrReplaceTempView("pr_p")
    exp = spark.sql(
        """
        SELECT unix_millis(date_trunc('month', l_shipdate)) AS m,
               round(100.0 * sum(CASE WHEN p_type='PROMO'
                     THEN l_extendedprice*(1-l_discount) ELSE 0.0 END)
                   / sum(l_extendedprice*(1-l_discount)), 6) AS pct
        FROM pr_l JOIN pr_p ON l_partkey = p_partkey GROUP BY m
        """
    ).collect()
    for r in exp:
        assert rows[r["m"]]["promo_pct"] == r["pct"]
