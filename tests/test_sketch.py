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


# ---------------------------------------------------------------------------
# Count-min sketch
# ---------------------------------------------------------------------------

from airbyte_destination_spark.functions.sketch import (  # noqa: E402
    CMS_D,
    CMS_W,
    KMV_K,
    cms_estimate,
    cms_state,
    kmv_estimate,
    kmv_overlap,
    kmv_sketch,
)


def _zipf_df(spark, n=4000):
    # v = id % (id % 97 + 1)-ish skew: heavy low values, long tail
    return spark.range(n).select(
        F.lit("g").alias("g"),
        (F.col("id") % (F.col("id") % 89 + 1)).cast("long").alias("v"),
    )


def test_cms_upper_bound_and_exact_heavy_hitters(spark):
    df = _zipf_df(spark)
    exact = df.groupBy("v").agg(F.count(F.lit(1)).alias("f"))
    probes = exact.orderBy(F.col("f").desc(), F.col("v")).limit(20)
    state = cms_state(df, "v", [])
    est = cms_estimate(state, probes.select("v"), "v", [])
    rows = (
        probes.join(est, "v")
        .select("v", "f", "cms_est")
        .collect()
    )
    assert len(rows) == 20
    for r in rows:
        # CMS never underestimates
        assert r["cms_est"] >= r["f"], r


def test_cms_state_bounded_and_sum_mergeable(spark):
    df = _zipf_df(spark)
    whole = cms_state(df, "v", [])
    assert whole.count() <= CMS_D * CMS_W
    a, b = df.where("id % 2 = 0"), df.where("id % 2 = 1")
    merged = (
        cms_state(a, "v", [])
        .unionByName(cms_state(b, "v", []))
        .groupBy("row_i", "idx")
        .agg(F.sum("c").alias("c"))
    )
    diff = (
        whole.join(merged, ["row_i", "idx"], "full")
        .where(
            whole["c"].isNull()
            | merged["c"].isNull()
            | (whole["c"] != merged["c"])
        )
        .count()
    )
    assert diff == 0


def test_cms_distinct_weighted_equals_per_instance_grid(spark):
    """The md5-volume optimization: hashing only DISTINCT values with
    count-weighted increments must produce the IDENTICAL counter grid
    to hashing every instance (sum of weights = sum of instances)."""
    df = _zipf_df(spark)
    optimized = cms_state(df, "v", ["g"])
    # reference: per-instance grid, computed inline the pre-optimization way
    from airbyte_destination_spark.functions.sketch import CMS_D, cms_index

    idxs = F.array(*[cms_index(F.col("v"), i) for i in range(CMS_D)])
    per_instance = (
        df.select("g", F.posexplode(idxs).alias("row_i", "idx"))
        .groupBy("g", "row_i", "idx")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    diff = (
        optimized.join(per_instance, ["g", "row_i", "idx"], "full")
        .where(
            optimized["c"].isNull()
            | per_instance["c"].isNull()
            | (optimized["c"] != per_instance["c"])
        )
        .count()
    )
    assert diff == 0


def test_cms_absent_probe_estimates_small(spark):
    df = _zipf_df(spark)
    state = cms_state(df, "v", [])
    probes = spark.range(1).select(F.lit(10**12).cast("long").alias("v"))
    est = cms_estimate(state, probes, "v", []).collect()[0]["cms_est"]
    # a never-seen key can only collide, not accumulate real mass
    assert est < 200


# ---------------------------------------------------------------------------
# KMV / theta sketch
# ---------------------------------------------------------------------------


def test_kmv_exact_below_k(spark):
    df = spark.range(100).select(
        F.lit("g").alias("g"), F.col("id").alias("v")
    )
    sk = kmv_sketch(df, "v", ["g"])
    assert sk.count() == 100
    est = kmv_estimate(sk, ["g"]).collect()[0]["kmv_estimate"]
    assert est == 100.0


def test_kmv_accuracy_and_min_k_merge(spark):
    whole = spark.range(20000).select(
        F.lit("g").alias("g"), F.col("id").alias("v")
    )
    sk = kmv_sketch(whole, "v", ["g"])
    assert sk.count() == KMV_K
    est = kmv_estimate(sk, ["g"]).collect()[0]["kmv_estimate"]
    assert abs(est - 20000) / 20000 < 0.25, est
    # min-k merge of two shard sketches == whole-input sketch
    a = kmv_sketch(whole.where("v % 2 = 0"), "v", ["g"])
    b = kmv_sketch(whole.where("v % 2 = 1"), "v", ["g"])
    from pyspark.sql.window import Window

    merged = (
        a.select("g", "h")
        .unionByName(b.select("g", "h"))
        .distinct()
        .withColumn(
            "pos",
            F.row_number().over(Window.partitionBy("g").orderBy("h")),
        )
        .where(F.col("pos") <= KMV_K)
    )
    diff = (
        merged.select("h")
        .exceptAll(sk.select("h"))
        .union(sk.select("h").exceptAll(merged.select("h")))
        .count()
    )
    assert diff == 0


def test_kmv_overlap_estimates(spark):
    # A = 0..11999, B = 6000..17999 -> |A|=|B|=12000, inter 6000, union 18000
    a = spark.range(0, 12000).select(F.col("id").alias("v"))
    b = spark.range(6000, 18000).select(F.col("id").alias("v"))
    ska = kmv_sketch(a.select(F.lit("a").alias("g"), "v"), "v", ["g"])
    skb = kmv_sketch(b.select(F.lit("b").alias("g"), "v"), "v", ["g"])
    row = kmv_overlap(ska, skb).collect()[0]
    assert abs(row["est_union"] - 18000) / 18000 < 0.25, row
    assert abs(row["est_intersection"] - 6000) / 6000 < 0.45, row
    assert 0.15 < row["jaccard_est"] < 0.55, row
    # determinism across parallelism
    ska2 = kmv_sketch(
        a.repartition(17).select(F.lit("a").alias("g"), "v"), "v", ["g"]
    )
    skb2 = kmv_sketch(
        b.repartition(5).select(F.lit("b").alias("g"), "v"), "v", ["g"]
    )
    row2 = kmv_overlap(ska2, skb2).collect()[0]
    assert row == row2


def test_kmv_overlap_disjoint_sets(spark):
    a = spark.range(0, 5000).select(F.lit("a").alias("g"), F.col("id").alias("v"))
    b = spark.range(100000, 105000).select(
        F.lit("b").alias("g"), (F.col("id")).alias("v")
    )
    row = kmv_overlap(
        kmv_sketch(a, "v", ["g"]), kmv_sketch(b, "v", ["g"])
    ).collect()[0]
    # disjoint inputs: shared hashes essentially impossible at 60 bits
    assert row["n_common_retained"] == 0
    assert row["est_intersection"] == 0.0
    assert row["jaccard_est"] == 0.0


# ---------------------------------------------------------------------------
# Sketch state maintained in the lake (IVM via the aggregate engine)
# ---------------------------------------------------------------------------


def test_hll_registers_ivm_exactly_once(spark, tmp_path):
    """A register table folded with agg_spec {r: max} equals the direct
    sketch, replaying an epoch is a no-op, and the state stays bounded."""
    from pyspark.sql import types as T

    from airbyte_destination_spark.lake import LakeTable

    whole = _df(spark, 6000)
    table = LakeTable(str(tmp_path / "t"))
    table.create(
        T.StructType(
            [
                T.StructField("g", T.StringType(), False),
                T.StructField("bucket", T.IntegerType(), False),
                T.StructField("v", T.LongType(), False),
                T.StructField("r", T.IntegerType(), True),
            ]
        ),
        ["g", "bucket"],
        "v",
        n_buckets=4,
        merge_strategy="cow",
        agg_spec={"r": "max"},
    )
    from airbyte_destination_spark.functions.sketch import hll_bucket_rank

    bucket, rank = hll_bucket_rank(F.col("v"))
    for i, shard in enumerate((whole.where("v % 2 = 0"), whole.where("v % 2 = 1"))):
        regs = (
            shard.select("g", bucket.alias("bucket"), rank.alias("rank"), "v")
            .groupBy("g", "bucket")
            .agg(F.max("rank").alias("r"), F.max("v").alias("v"))
            .withColumn("op", F.lit("U"))
        )
        table.merge(regs, epoch_id=f"e{i}", reduce="aggregate")
        table.merge(regs, epoch_id=f"e{i}", reduce="aggregate")  # replay: no-op
    maintained = table.read(spark).select("g", "bucket", "r")
    assert maintained.count() <= 256
    est_m = hll_estimate(maintained, ["g"]).collect()[0]
    est_d = hll_distinct(whole, "v", ["g"]).collect()[0]
    assert est_m["hll_estimate"] == est_d["hll_estimate"]
    assert est_m["n_zero_registers"] == est_d["n_zero_registers"]


def test_kmv_overlap_degenerate_exact_mode(spark):
    """Union below k = exact mode: theta conceptually covers the whole
    hash space, so the intersection counts ALL shared hashes — two
    identical singletons are jaccard 1, and a shared hash that happens
    to BE the union max is not dropped by the full-mode strict-< cut."""
    a = spark.createDataFrame([("a", "x")], "g string, v string")
    b = spark.createDataFrame([("b", "x")], "g string, v string")
    row = kmv_overlap(
        kmv_sketch(a, "v", ["g"]), kmv_sketch(b, "v", ["g"])
    ).collect()[0]
    assert row["est_union"] == 1.0
    assert row["est_intersection"] == 1.0
    assert row["n_common_retained"] == 1
    assert row["jaccard_est"] == 1.0
    # a proper subset below k: exact counts throughout
    a2 = spark.createDataFrame(
        [("a", str(i)) for i in range(10)], "g string, v string"
    )
    b2 = spark.createDataFrame(
        [("b", str(i)) for i in range(5, 20)], "g string, v string"
    )
    row2 = kmv_overlap(
        kmv_sketch(a2, "v", ["g"]), kmv_sketch(b2, "v", ["g"])
    ).collect()[0]
    assert row2["est_union"] == 20.0
    assert row2["est_intersection"] == 5.0
    assert abs(row2["jaccard_est"] - 0.25) < 1e-12


# ---------------------------------------------------------------------------
# HDR histogram quantile sketch
# ---------------------------------------------------------------------------


def test_hdr_bin_monotone_and_rep_error_bound(spark):
    from airbyte_destination_spark.functions.sketch import hdr_bin, hdr_rep

    vals = list(range(0, 200)) + [
        255, 256, 1000, 4095, 4096, 65535, 10**6, 10**9, 2**40, 2**52
    ]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    rows = (
        df.select("v", hdr_bin(F.col("v")).alias("b"))
        .withColumn("rep", hdr_rep(F.col("b")))
        .orderBy("v")
        .collect()
    )
    bins = [r["b"] for r in rows]
    assert bins == sorted(bins)  # monotone: bin order IS value order
    for r in rows:
        if r["v"] < 32:
            assert r["b"] == r["v"] and r["rep"] == r["v"]  # exact bins
        else:
            assert abs(r["rep"] - r["v"]) / r["v"] <= 1 / 32 + 1e-12


def test_hdr_state_bounded_and_sum_mergeable(spark):
    from airbyte_destination_spark.functions.sketch import (
        hdr_quantiles,
        hdr_state,
    )

    whole = spark.range(20000).select(
        F.lit("g").alias("g"), ((F.col("id") * 7919) % 60000).alias("v")
    )
    # state bounded by the bin count, not the input size
    assert hdr_state(whole, "v", ["g"]).count() <= 960
    a, b = whole.where("id % 2 = 0"), whole.where("id % 2 = 1")
    merged = (
        hdr_state(a, "v", ["g"])
        .unionByName(hdr_state(b, "v", ["g"]))
        .groupBy("g", "bin")
        .agg(F.sum("c").alias("c"))
    )
    est_m = hdr_quantiles(merged, ["g"]).collect()[0]
    est_w = hdr_quantiles(hdr_state(whole, "v", ["g"]), ["g"]).collect()[0]
    assert est_m == est_w  # sum-merge is exact: same state, same reads


def test_hdr_quantiles_within_bound_of_exact(spark):
    import math
    import random

    from airbyte_destination_spark.functions.sketch import (
        hdr_quantiles,
        hdr_state,
    )

    rng = random.Random(11)
    data = [("g%d" % (i % 2), rng.randint(0, 50000)) for i in range(4000)]
    df = spark.createDataFrame(data, "g string, v long")
    byg: dict[str, list[int]] = {}
    for g, v in data:
        byg.setdefault(g, []).append(v)
    for r in hdr_quantiles(hdr_state(df, "v", ["g"]), ["g"]).collect():
        vs = sorted(byg[r["g"]])
        n = len(vs)
        assert r["n_rows"] == n
        for q, est in (
            (0.5, r["p50_est"]),
            (0.9, r["p90_est"]),
            (0.99, r["p99_est"]),
        ):
            true = vs[math.ceil(q * n) - 1]  # type-1 discrete quantile
            assert abs(est - true) / max(true, 1) <= 1 / 32 + 1e-12
