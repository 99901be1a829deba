"""read_keys bucket pruning, destination schema evolution, logger parity."""

import io
import json

from pyspark.sql import types as T

from airbyte_destination_spark import protocol as P
from airbyte_destination_spark.destination import Destination
from airbyte_destination_spark.lake import LakeTable
from airbyte_destination_spark.logger import AirbyteLogger


def test_read_keys_prunes_buckets(spark, tmp_path):
    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType(), False),
            T.StructField("change_lsn", T.LongType(), False),
        ]
    )
    t = LakeTable(str(tmp_path / "t"))
    t.create(schema, ["doc_id"], "change_lsn", n_buckets=16)
    b = spark.createDataFrame(
        [(f"d{i}", i, "I") for i in range(500)], "doc_id string, change_lsn long, op string"
    )
    t.merge(b)
    out = t.read_keys(spark, ["d7", "d400", "nope"])
    assert sorted(r.doc_id for r in out.collect()) == ["d400", "d7"]


def test_destination_schema_evolution_across_syncs(spark, tmp_path):
    """Second sync's catalog adds a column -> table evolves, old rows
    read back NULL-filled (the north_rule schema-evolution criterion at
    the destination surface)."""
    dest = Destination(spark, P.Config(warehouse=str(tmp_path / "wh"), n_buckets=4))

    def catalog(props):
        return P.ConfiguredCatalog.from_dict(
            {
                "streams": [
                    {
                        "sync_mode": "incremental",
                        "cursor_field": ["updated_at"],
                        "primary_key": [["id"]],
                        "destination_sync_mode": "append_dedup",
                        "stream": {"name": "s", "json_schema": {"properties": props}},
                    }
                ]
            }
        )

    base_props = {
        "id": {"type": "integer"},
        "name": {"type": "string"},
        "updated_at": {"type": "string", "format": "date-time"},
    }
    rec1 = json.dumps(
        {
            "type": "RECORD",
            "record": {
                "stream": "s",
                "emitted_at": 1000,
                "data": {"id": 1, "name": "a", "updated_at": "2024-01-01T00:00:00Z"},
            },
        }
    )
    dest.write(catalog(base_props), spark.createDataFrame([(rec1,)], "value string"))

    evolved = dict(base_props)
    evolved["score"] = {"type": "number"}
    rec2 = json.dumps(
        {
            "type": "RECORD",
            "record": {
                "stream": "s",
                "emitted_at": 2000,
                "data": {"id": 2, "name": "b", "updated_at": "2024-01-02T00:00:00Z", "score": 0.5},
            },
        }
    )
    dest.write(catalog(evolved), spark.createDataFrame([(rec2,)], "value string"))

    rows = {r.id: r for r in dest.read_table("s").collect()}
    assert rows[1].score is None and rows[2].score == 0.5


def test_logger_ndjson_and_buffering():
    buf = io.StringIO()
    lg = AirbyteLogger(buf)
    lg.log("INFO", "hi")
    lg.connection_status("SUCCEEDED")
    lg.record("s", {"x": 1}, 123)
    assert "RECORD" not in buf.getvalue()  # buffered
    lg.flush()
    lines = [json.loads(l) for l in buf.getvalue().splitlines()]
    assert [l["type"] for l in lines] == ["LOG", "CONNECTION_STATUS", "RECORD"]
    assert lines[2]["record"]["data"] == {"x": 1}
