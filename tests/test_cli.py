"""CLI failure matrix + happy path, mirroring the reference's
TestDestination_Write table (destination_test.go:93-224): invalid
config path and invalid catalog path produce an ERROR log line and a
nonzero exit; spec and check emit protocol messages on stdout."""

import json

from airbyte_destination_spark.cli import main


def _run(capsys, *argv):
    rc = main(list(argv))
    out = capsys.readouterr().out.strip()
    msgs = [json.loads(line) for line in out.splitlines() if line]
    return rc, msgs


def test_spec(capsys):
    rc, msgs = _run(capsys, "spec")
    assert rc == 0
    assert msgs[0]["type"] == "SPEC"
    assert "overwrite" in msgs[0]["spec"]["supported_destination_sync_modes"]


def test_check_invalid_config_path(capsys):
    rc, msgs = _run(capsys, "check", "--config", "invalid/config/path")
    assert rc == 0  # check reports status, it does not crash
    st = msgs[0]["connectionStatus"]
    assert msgs[0]["type"] == "CONNECTION_STATUS" and st["status"] == "FAILED"


def test_write_invalid_config_path(capsys, tmp_path):
    cat = tmp_path / "cat.json"
    cat.write_text(json.dumps({"streams": []}))
    rc, msgs = _run(
        capsys, "write", "--config", "invalid/config/path", "--catalog", str(cat),
        "/dev/null",
    )
    assert rc == 1
    log = msgs[0]["log"]
    assert log["level"] == "ERROR" and log["message"].startswith("Configuration is invalid")


def test_write_invalid_catalog_path(capsys, tmp_path):
    cfg = tmp_path / "cfg.json"
    cfg.write_text(json.dumps({"warehouse": str(tmp_path / "wh")}))
    rc, msgs = _run(
        capsys, "write", "--config", str(cfg), "--catalog", "invalid/catalog/path",
        "/dev/null",
    )
    assert rc == 1
    log = msgs[0]["log"]
    assert log["level"] == "ERROR" and log["message"].startswith(
        "Configured catalog is invalid"
    )


def test_write_happy_path_echoes_state(spark, capsys, tmp_path):
    cfg = tmp_path / "cfg.json"
    cfg.write_text(json.dumps({"warehouse": str(tmp_path / "wh"), "n_buckets": 4}))
    cat = tmp_path / "cat.json"
    cat.write_text(
        json.dumps(
            {
                "streams": [
                    {
                        "destination_sync_mode": "append",
                        "stream": {
                            "name": "s1",
                            "json_schema": {
                                "properties": {
                                    "id": {"type": "integer"},
                                    "v": {"type": "string"},
                                }
                            },
                        },
                    }
                ]
            }
        )
    )
    nd = tmp_path / "in.ndjson"
    nd.write_text(
        "\n".join(
            [
                json.dumps(
                    {
                        "type": "RECORD",
                        "record": {
                            "stream": "s1",
                            "emitted_at": 1705379716,
                            "data": {"id": 1, "v": "a"},
                        },
                    }
                ),
                json.dumps(
                    {"type": "STATE", "state": {"id": 1, "sourceStats": {"recordCount": 1.0}}}
                ),
            ]
        )
        + "\n"
    )
    rc, msgs = _run(capsys, "write", "--config", str(cfg), "--catalog", str(cat), str(nd))
    assert rc == 0
    states = [m for m in msgs if m["type"] == "STATE"]
    assert len(states) == 1
    assert states[0]["state"]["destinationStats"] == {"recordCount": 1.0}
    assert any(m["type"] == "LOG" and "wrote" in m["log"]["message"] for m in msgs)


def test_maintain_cli_lifecycle(spark, capsys, tmp_path):
    """`maintain` drives compact / bloom / analyze / describe / expire
    against a table root and reports each result as a LOG message."""
    from pyspark.sql import types as T

    from airbyte_destination_spark.lake import LakeTable

    root = str(tmp_path / "m")
    t = LakeTable(root)
    t.create(
        T.StructType(
            [
                T.StructField("k", T.LongType(), False),
                T.StructField("v", T.LongType(), False),
            ]
        ),
        ["k"],
        "v",
        n_buckets=2,
        merge_strategy="mor",
    )
    S = "k long, v long, op string"
    for i in range(3):
        t.merge(
            spark.createDataFrame([(j, i, "I") for j in range(20)], S),
            epoch_id=f"e{i}",
        )

    def payload(msgs):
        return json.loads(msgs[-1]["log"]["message"])

    rc, msgs = _run(capsys, "maintain", "--table", root, "bloom")
    assert rc == 0 and payload(msgs)["blooms_built"] > 0
    rc, msgs = _run(capsys, "maintain", "--table", root, "compact",
                    "--min-files", "1")
    assert rc == 0 and payload(msgs)["compacted_version"] > 0
    rc, msgs = _run(capsys, "maintain", "--table", root, "analyze")
    assert rc == 0 and payload(msgs)["row_count"] == 20
    rc, msgs = _run(capsys, "maintain", "--table", root, "describe")
    d = payload(msgs)
    assert d["n_data_files"] > 0 and d["stats"]["row_count"] == 20
    rc, msgs = _run(capsys, "maintain", "--table", root, "expire",
                    "--keep-last", "100")
    assert rc == 0 and "expired_versions" in payload(msgs)
