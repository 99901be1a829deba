"""HyperLogLog sketch (functions/sketch.py): mergeability, accuracy,
and the deterministic-fold contract that lets the DuckDB oracle match
the float estimate bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from airbyte_destination_spark.functions.sketch import (
    hll_distinct,
    hll_estimate,
    hll_registers,
)


def _df(spark, n, group="g"):
    return spark.range(n).select(
        F.lit(group).alias("g"), F.col("id").alias("v")
    )


def test_registers_merge_across_shards(spark):
    whole = _df(spark, 5000)
    a, b = whole.where("v % 2 = 0"), whole.where("v % 2 = 1")
    merged = (
        hll_registers(a, "v", ["g"])
        .unionByName(hll_registers(b, "v", ["g"]))
        .groupBy("g", "bucket")
        .agg(F.max("r").alias("r"))
    )
    est_merged = hll_estimate(merged, ["g"]).collect()[0]
    est_whole = hll_distinct(whole, "v", ["g"]).collect()[0]
    assert est_merged["hll_estimate"] == est_whole["hll_estimate"]
    assert est_merged["n_zero_registers"] == est_whole["n_zero_registers"]


def test_estimate_accuracy_and_determinism(spark):
    for n in (500, 5000, 50000):
        rows = hll_distinct(_df(spark, n), "v", ["g"]).collect()
        est = rows[0]["hll_estimate"]
        assert abs(est - n) / n < 0.2, (n, est)
        # deterministic: same input, same double, any parallelism
        est2 = hll_distinct(
            _df(spark, n).repartition(13), "v", ["g"]
        ).collect()[0]["hll_estimate"]
        assert est == est2


def test_duplicates_do_not_move_the_sketch(spark):
    once = hll_distinct(_df(spark, 3000), "v", ["g"]).collect()[0]
    thrice = hll_distinct(
        _df(spark, 3000).unionAll(_df(spark, 3000)).unionAll(_df(spark, 3000)),
        "v",
        ["g"],
    ).collect()[0]
    assert once["hll_estimate"] == thrice["hll_estimate"]


def test_register_state_is_bounded(spark):
    regs = hll_registers(_df(spark, 50000), "v", ["g"])
    assert regs.count() <= 256
    assert regs.agg(F.max("r")).first()[0] <= 65
