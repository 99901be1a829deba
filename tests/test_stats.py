"""Exact distributed quantiles: parity with the quantile_cont definition
on hand-computable cases, including the single-row-group guard."""

from pyspark.sql import functions as F

from airbyte_destination_spark.functions.stats import quantiles_exact
from airbyte_destination_spark.functions.text import block_dedup
from airbyte_destination_spark.plans import executed_plan


def test_quantiles_match_definition(spark):
    # g=a: values 1..4 -> p50 = 2.5; g=b: [10,10,20] -> p50 = 10.
    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("a", 3), ("a", 4), ("b", 10), ("b", 10), ("b", 20)],
        "g string, v int",
    )
    out = {
        r.g: r
        for r in quantiles_exact(df, "v", "g", qs=(0.5, 0.25)).collect()
    }
    assert out["a"].p50 == 2.5 and out["a"].p25 == 1.75
    assert out["b"].p50 == 10.0 and out["b"].n_rows == 3
    assert out["a"].mean == 2.5


def test_quantiles_single_row_group(spark):
    df = spark.createDataFrame([("solo", 7)], "g string, v int")
    row = quantiles_exact(df, "v", "g", qs=(0.5, 0.99)).collect()[0]
    # frac interpolation against a missing next rank must not null out
    assert row.p50 == 7.0 and row.p99 == 7.0


def test_quantiles_no_group_sized_buffer(spark):
    # plan must aggregate a histogram, not collect groups: no
    # ObjectHashAggregate with percentile buffers anywhere.
    df = spark.createDataFrame([("a", i % 5) for i in range(100)], "g string, v int")
    plan = executed_plan(quantiles_exact(df, "v", "g"))
    assert "percentile" not in plan.lower()


def test_block_dedup_flags_shared_blocks(spark):
    shared = " ".join(f"w{i}" for i in range(16))
    uniq_a = " ".join(f"a{i}" for i in range(16))
    uniq_b = " ".join(f"b{i}" for i in range(16))
    df = spark.createDataFrame(
        [(1, f"{shared} {uniq_a}"), (2, f"{shared} {uniq_b}"), (3, uniq_b)],
        "doc_id int, text string",
    )
    out = {r.doc_id: r for r in block_dedup(df, block_words=16).collect()}
    assert out[1].n_blocks == 2 and out[1].dup_blocks == 1
    assert out[1].dup_block_ratio == 0.5
    # doc 3 IS doc 2's second block: both flagged
    assert out[3].dup_blocks == 1 and out[2].dup_blocks == 2


def test_analyze_table_statistics(spark, tmp_path):
    """analyze() scans the visible state once: row count, per-column
    nulls / approx NDV / min-max, persisted per version; describe()
    surfaces the latest with staleness."""
    from pyspark.sql import types as T

    from airbyte_destination_spark.lake import LakeTable

    t = LakeTable(str(tmp_path / "an"))
    t.create(
        T.StructType(
            [
                T.StructField("k", T.LongType(), False),
                T.StructField("v", T.LongType(), False),
                T.StructField("grp", T.StringType(), True),
            ]
        ),
        ["k"],
        "v",
        n_buckets=4,
        merge_strategy="mor",
    )
    S = "k long, v long, grp string, op string"
    rows = [(i, 1, None if i % 5 == 0 else f"g{i % 3}", "I") for i in range(100)]
    t.merge(spark.createDataFrame(rows, S), epoch_id="e0")
    t.merge(spark.createDataFrame([(0, 2, None, "D")], S), epoch_id="e1")
    st = t.analyze(spark)
    assert st["row_count"] == 99  # tombstoned row excluded
    ck = st["columns"]["k"]
    assert ck["null_count"] == 0 and ck["min"] == 1 and ck["max"] == 99
    # approx NDV within HLL tolerance of the true 99
    assert abs(ck["ndv"] - 99) <= 10
    cg = st["columns"]["grp"]
    assert cg["null_count"] == 19  # 20 multiples of 5 minus deleted k=0
    assert abs(cg["ndv"] - 3) <= 1
    d = t.describe()
    assert d["stats"]["row_count"] == 99 and d["stats"]["versions_stale"] == 0
    t.merge(spark.createDataFrame([(500, 3, "gX", "I")], S), epoch_id="e2")
    assert t.describe()["stats"]["versions_stale"] == 1
    st2 = t.analyze(spark, columns=["grp"])
    assert set(st2["columns"]) == {"grp"}
    assert t.describe()["stats"]["versions_stale"] == 0
