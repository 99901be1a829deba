"""Debezium envelope adapter (sources/debezium.py): both wrappings in
one parse, op mapping, image selection, lsn fallback chain, tombstone
drop vs quarantine, and end-to-end interchangeability with the Airbyte
path through the lake merge."""

import json

from pyspark.sql import functions as F
from pyspark.sql import types as T

from airbyte_destination_spark.sources.debezium import (
    read_debezium_json,
    to_debezium_json,
)

DATA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("tokens", T.ArrayType(T.IntegerType())),
    ]
)


def _lines(spark, rows):
    return spark.createDataFrame([(json.dumps(r) if not isinstance(r, str) else r,) for r in rows], "value string")


def test_wrapped_and_unwrapped_parse_identically(spark):
    ev = {"after": {"doc_id": "a", "tokens": [1]}, "before": None,
          "source": {"table": "t", "db": "d", "lsn": 7}, "op": "c", "ts_ms": 70}
    lines = _lines(spark, [ev, {"payload": ev}])
    rec, bad = read_debezium_json(spark, lines, DATA)
    rows = rec.collect()
    assert bad.count() == 0 and len(rows) == 2
    expect = ("t", "d", "I", 7, 70, ("a", (1,)))
    got = {
        (r["stream"], r["namespace"], r["op"], r["change_lsn"], r["emitted_at"],
         (r["data"]["doc_id"], tuple(r["data"]["tokens"])))
        for r in rows
    }
    assert got == {expect}


def test_op_mapping_image_selection_and_quarantine(spark):
    src = {"table": "t", "db": "d", "lsn": 1}
    rows = [
        {"op": "r", "after": {"doc_id": "snap", "tokens": []}, "source": src},
        {"op": "u", "after": {"doc_id": "upd", "tokens": [2]}, "source": src},
        {"op": "d", "before": {"doc_id": "del", "tokens": None}, "source": src},
        {"op": "t", "source": src},                     # truncate: unmapped
        {"op": "u", "after": None, "source": src},      # missing image
        "{broken",                                      # unparseable
    ]
    rec, bad = read_debezium_json(spark, _lines(spark, rows), DATA)
    got = {r["data"]["doc_id"]: r["op"] for r in rec.collect()}
    assert got == {"snap": "I", "upd": "U", "del": "D"}
    assert bad.count() == 3


def test_tombstones_dropped_silently(spark):
    rec, bad = read_debezium_json(spark, _lines(spark, ["", "null", "  "]), DATA)
    assert rec.count() == 0 and bad.count() == 0


def test_lsn_fallback_chain_postgres_mysql_tsms(spark):
    rows = [
        {"op": "c", "after": {"doc_id": "pg", "tokens": None},
         "source": {"table": "t", "lsn": 100, "pos": 5}, "ts_ms": 1},
        {"op": "c", "after": {"doc_id": "my", "tokens": None},
         "source": {"table": "t", "pos": 42, "file": "binlog.0002"}, "ts_ms": 2},
        {"op": "c", "after": {"doc_id": "ts", "tokens": None},
         "source": {"table": "t"}, "ts_ms": 333},
    ]
    rec, _ = read_debezium_json(spark, _lines(spark, rows), DATA)
    got = {r["data"]["doc_id"]: r["change_lsn"] for r in rec.collect()}
    assert got == {"pg": 100, "my": 42, "ts": 333}


def test_namespace_prefers_schema_over_db(spark):
    rows = [{"op": "c", "after": {"doc_id": "x", "tokens": None},
             "source": {"table": "t", "db": "mydb", "schema": "public", "lsn": 1}}]
    rec, _ = read_debezium_json(spark, _lines(spark, rows), DATA)
    assert rec.first()["namespace"] == "public"


def test_debezium_log_replays_to_same_lake_state_as_airbyte_path(spark, tmp_path):
    """Format interchangeability: the same logical change sequence fed
    through the Debezium adapter and merged into a LakeTable produces
    the exact final state of the direct internal-shape merge."""
    from airbyte_destination_spark.lake import LakeTable

    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("tokens", T.ArrayType(T.IntegerType())),
            T.StructField("change_lsn", T.LongType()),
        ]
    )
    changes = spark.createDataFrame(
        [("d1", [1], 1, "I"), ("d1", [2, 2], 2, "U"), ("d2", [9], 3, "I"),
         ("d2", None, 4, "D"), ("d3", [7], 5, "I"), ("d2", [4], 6, "I")],
        "doc_id string, tokens array<int>, change_lsn long, op string",
    )
    # path A: direct internal shape
    ta = LakeTable(str(tmp_path / "a"))
    ta.create(schema, ["doc_id"], "change_lsn", n_buckets=4)
    ta.merge(changes, epoch_id="e0")
    # path B: render as mixed-wrapping Debezium NDJSON, parse, merge
    lines = to_debezium_json(changes, wrapped_pred=F.col("change_lsn") % 2 == 0)
    rec, bad = read_debezium_json(
        spark, lines,
        T.StructType([f for f in schema.fields if f.name != "change_lsn"]),
    )
    assert bad.count() == 0
    tb = LakeTable(str(tmp_path / "b"))
    tb.create(schema, ["doc_id"], "change_lsn", n_buckets=4)
    tb.merge(
        rec.select("op", "change_lsn", "data.doc_id", "data.tokens"), epoch_id="e0"
    )
    a = {r["doc_id"]: r["tokens"] for r in ta.read(spark).collect()}
    b = {r["doc_id"]: r["tokens"] for r in tb.read(spark).collect()}
    assert a == b == {"d1": [2, 2], "d2": [4], "d3": [7]}


def test_lsn_prefers_source_commit_time_over_envelope_time(spark):
    """The envelope's ts_ms is Kafka-Connect PROCESSING time — a
    redelivered event gets a newer one for an older change. The
    fallback chain must use source.ts_ms (db commit time) first and
    the envelope only as the very last resort."""
    rows = [
        {"op": "c", "after": {"doc_id": "a", "tokens": None},
         "source": {"table": "t", "ts_ms": 100}, "ts_ms": 999},
        {"op": "c", "after": {"doc_id": "b", "tokens": None},
         "source": {"table": "t"}, "ts_ms": 333},
    ]
    rec, _ = read_debezium_json(
        spark,
        spark.createDataFrame([(json.dumps(r),) for r in rows], "value string"),
        DATA,
    )
    got = {r["data"]["doc_id"]: r["change_lsn"] for r in rec.collect()}
    assert got == {"a": 100, "b": 333}


def test_transaction_metadata_rides_into_txn_atomic_apply(spark, tmp_path):
    """Debezium `transaction.id` metadata (provides.transaction.metadata)
    parses into txn_id and drives whole-transaction-atomic apply:
    NULL txn_id = auto-commit singleton, the plan keeps multi-event
    transactions whole, and the final state equals the direct merge."""
    from airbyte_destination_spark.lake import LakeTable
    from airbyte_destination_spark.streaming.pipeline import IngestConfig
    from airbyte_destination_spark.streaming.txn import apply_txn_log, txn_epoch_plan

    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("tokens", T.ArrayType(T.IntegerType())),
            T.StructField("change_lsn", T.LongType()),
        ]
    )
    changes = spark.createDataFrame(
        [
            ("d1", [1], 1, "I", "tx-1"),
            ("d2", [2], 2, "I", "tx-1"),       # tx-1 spans 2 events
            ("d1", [3], 3, "U", None),         # auto-commit
            ("d3", [4], 4, "I", "tx-2"),
            ("d2", None, 5, "D", "tx-2"),      # tx-2 spans 2 events
            ("d3", [6], 6, "U", None),
        ],
        "doc_id string, tokens array<int>, change_lsn long, op string, tid string",
    )
    lines = to_debezium_json(
        changes, txn_col="tid", wrapped_pred=F.col("change_lsn") % 2 == 0
    )
    rec, bad = read_debezium_json(spark, lines, DATA)
    assert bad.count() == 0
    parsed = {r.change_lsn: r.txn_id for r in rec.collect()}
    assert parsed == {1: "tx-1", 2: "tx-1", 3: None, 4: "tx-2", 5: "tx-2", 6: None}

    log = rec.select(
        "op",
        "change_lsn",
        F.col("data.doc_id").alias("doc_id"),
        F.col("data.tokens").alias("tokens"),
        F.coalesce(
            F.col("txn_id"), F.concat(F.lit("auto-"), F.col("change_lsn"))
        ).alias("txn_id"),
    )
    # every multi-event txn stays whole even under a 1-record cap
    plan = txn_epoch_plan(log, max_records=1)
    per_txn = {r.txn_id: r.n_records for r in plan.collect()}
    assert per_txn["tx-1"] == 2 and per_txn["tx-2"] == 2
    assert plan.count() == 4  # tx-1, auto-3, tx-2, auto-6

    t = LakeTable(str(tmp_path / "t"))
    t.create(schema, ["doc_id"], "change_lsn", n_buckets=4)
    stats = apply_txn_log(
        spark,
        log,
        t,
        # validate=False: this table has no n_tok column, so the
        # token-array invariant check does not apply
        IngestConfig(
            key_cols=["doc_id"], version_col="change_lsn", n_buckets=4,
            validate=False,
        ),
        max_records=1,
        stage_dir=str(tmp_path / "s"),
    )
    assert len(stats) == 4  # one atomic commit per planned epoch
    state = {r.doc_id: r.tokens for r in t.read(spark).collect()}
    assert state == {"d1": [3], "d3": [6]}
