"""Aggregation merge engine (reduce='aggregate'): per-column declared
aggregate folds with delete-cut, standalone and through
LakeTable.merge across ordered epochs.

Reference frame: the reference delegates aggregation to its warehouse
(ClickHouse SummingMergeTree / AggregatingMergeTree, the engine family
next to the ReplacingMergeTree it configures at destination.go:337-351);
Paimon calls the same shape the `aggregation` merge engine. Semantics
doc: operators/dedup.aggregate_reduce.
"""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from airbyte_destination_spark.lake import LakeTable
from airbyte_destination_spark.operators.dedup import aggregate_reduce

LOG_SCHEMA = "id int, v long, amount double, best string, seen boolean, op string"
SPEC = {"amount": "sum", "seen": "bool_or"}  # best defaults to last_non_null


def _schema():
    return T.StructType(
        [
            T.StructField("id", T.IntegerType(), False),
            T.StructField("v", T.LongType(), False),
            T.StructField("amount", T.DoubleType(), True),
            T.StructField("best", T.StringType(), True),
            T.StructField("seen", T.BooleanType(), True),
        ]
    )


@pytest.fixture()
def atable(tmp_table_root):
    t = LakeTable(tmp_table_root)
    t.create(_schema(), ["id"], "v", n_buckets=4, agg_spec=SPEC)
    return t


def test_aggregate_semantics_one_shot(spark):
    rows = [
        (1, 1, 10.0, "a", True, "I"),
        (1, 2, 5.0, None, False, "U"),
        (1, 3, 2.5, "b", None, "U"),
        (2, 1, 1.0, "x", False, "I"),
        (2, 2, None, None, None, "D"),  # cut: key 2 restarts
        (2, 3, 7.0, None, True, "U"),
        (3, 1, 4.0, "z", True, "I"),
        (3, 2, None, None, None, "D"),  # dead key
    ]
    df = spark.createDataFrame(rows, LOG_SCHEMA)
    out = {
        r.id: (r.v, r.amount, r.best, r.seen, r.op)
        for r in aggregate_reduce(df, ["id"], "v", SPEC).collect()
    }
    assert out[1] == (3, 17.5, "b", True, "U")
    assert out[2] == (3, 7.0, None, True, "U")  # pre-delete sum/best cut
    assert out[3] == (2, None, None, None, "D")


def test_merge_aggregate_epochs_equal_one_shot(spark, atable):
    rows = []
    for k in range(20):
        for step in range(6):
            lsn = k * 100 + step * 10
            if step == 3 and k % 4 == 0:
                rows.append((k, lsn, None, None, None, "D"))
            else:
                amt = float(k + step) if (k + step) % 3 != 0 else None
                best = f"s{step}" if step % 2 == 0 else None
                seen = (step % 5 == 1) if step != 2 else None
                rows.append((k, lsn, amt, best, seen, "I" if step == 0 else "U"))
    log = spark.createDataFrame(rows, LOG_SCHEMA)
    for i, (lo, hi) in enumerate([(0, 700), (700, 1400), (1400, 9999)]):
        atable.merge(
            log.where((F.col("v") >= lo) & (F.col("v") < hi)),
            epoch_id=f"e{i}",
            reduce="aggregate",
        )
    engine = {
        r.id: (r.v, r.amount, r.best, r.seen) for r in atable.read(spark).collect()
    }
    oneshot = {
        r.id: (r.v, r.amount, r.best, r.seen)
        for r in aggregate_reduce(log, ["id"], "v", SPEC)
        .where(F.col("op") == "U")
        .collect()
    }
    assert engine == oneshot
    # spot-check one undeleted key's running sum by hand
    k = 1  # steps 0-5, amounts where (1+step)%3!=0 -> steps 0,1,3,4 = 1+2+4+5
    assert engine[k][1] == 12.0


def test_aggregate_validation(spark, tmp_path):
    with pytest.raises(ValueError, match="unknown aggregate fn"):
        LakeTable(str(tmp_path / "a")).create(
            _schema(), ["id"], "v", agg_spec={"amount": "avg"}
        )
    with pytest.raises(ValueError, match="not in schema"):
        LakeTable(str(tmp_path / "b")).create(
            _schema(), ["id"], "v", agg_spec={"nope": "sum"}
        )
    with pytest.raises(ValueError, match="key/version"):
        LakeTable(str(tmp_path / "c")).create(
            _schema(), ["id"], "v", agg_spec={"v": "sum"}
        )
    with pytest.raises(ValueError, match="COW"):
        LakeTable(str(tmp_path / "d")).create(
            _schema(), ["id"], "v", merge_strategy="mor", agg_spec={"amount": "sum"}
        )
    # merge(reduce='aggregate') on a table with no bound spec
    t = LakeTable(str(tmp_path / "e"))
    t.create(_schema(), ["id"], "v", n_buckets=2)
    batch = spark.createDataFrame([(1, 1, 1.0, "a", True, "I")], LOG_SCHEMA)
    with pytest.raises(ValueError, match="agg_spec"):
        t.merge(batch, reduce="aggregate")


def test_aggregate_reduce_plan_shape(spark):
    """Exactly TWO exchanges: the full-data key shuffle plus a
    deletes-only sliver for the cut (Catalyst pushes the delete filter
    BELOW the cuts exchange and prunes it to (key, order) columns);
    neither the join nor the final fold adds a shuffle, and the fold
    keeps map-side partial combine (partial_sum before its exchange)."""
    from airbyte_destination_spark.plans import count_exchanges

    ev = (
        spark.read.parquet("/root/testdata/sf0.01/events.parquet")
        .select(
            "user_id",
            "event_id",
            F.col("value").alias("amount"),
            F.when(F.col("event_type") == "purchase", F.lit("D")).alias("op"),
        )
        .repartition(4, F.col("user_id"))
    )
    out = aggregate_reduce(ev, ["user_id"], "event_id", {"amount": "sum"})
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert count_exchanges(out) == 2, plan
    assert "partial_sum" in plan, plan
    # the cuts branch reads only (key, order) — amount/value never
    # enters the deletes-only shuffle
    # both join children print after the join node; the build (cuts)
    # side is the LAST scan in the plan string
    cuts_schema = plan.split("ReadSchema: struct<")[-1].split(">")[0]
    assert "value" not in cuts_schema and "amount" not in cuts_schema, plan
