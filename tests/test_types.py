"""Type-map matrix — parity with
/root/reference/internal/connector/types_test.go:12-70."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from airbyte_destination_spark.types import UnsupportedAirbyteType, airbyte_to_spark_type


@pytest.mark.parametrize(
    "prop,expected",
    [
        ({}, T.StringType()),  # no type -> string default
        ({"type": []}, T.StringType()),
        ({"type": ["null"]}, T.StringType()),
        ({"type": ["string", "integer"]}, T.StringType()),  # multi-type union -> string
        ({"type": "string"}, T.StringType()),
        ({"type": "string", "format": "date"}, T.DateType()),
        ({"type": "string", "format": "date-time"}, T.TimestampType()),
        ({"type": "string", "format": "time"}, T.StringType()),
        ({"type": ["null", "boolean"]}, T.BooleanType()),  # null stripped
        ({"type": "number"}, T.DoubleType()),
        ({"type": "integer"}, T.LongType()),
        ({"type": "array"}, T.StringType()),  # untyped array -> JSON string
        ({"type": "object"}, T.StringType()),
        # structured upgrade: typed items keep a columnar array type
        ({"type": "array", "items": {"type": "integer"}}, T.ArrayType(T.LongType())),
        (
            {"type": "object", "properties": {"a": {"type": "integer"}}},
            T.StructType([T.StructField("a", T.LongType(), True)]),
        ),
    ],
)
def test_type_map(prop, expected):
    assert airbyte_to_spark_type(prop) == expected


def test_unknown_type_raises():
    with pytest.raises(UnsupportedAirbyteType):
        airbyte_to_spark_type({"type": "frobnicate"})


def test_nested_union_catalog_fixture(spark):
    """The reference round-trips a deeply nested GitHub-style catalog with
    union types (internal/connector/parser_test.go:12-23,
    test_files/parser_sample.json). Same shape through our parser:
    unions of [null, X] stay nullable X, nested objects become structs
    (vs the reference's flatten-to-JSON), arrays keep item types."""
    from airbyte_destination_spark import protocol as P

    catalog = P.ConfiguredCatalog.from_dict(
        {
            "streams": [
                {
                    "sync_mode": "full_refresh",
                    "destination_sync_mode": "overwrite",
                    "stream": {
                        "name": "branches",
                        "json_schema": {
                            "type": "object",
                            "properties": {
                                "name": {"type": ["null", "string"]},
                                "commit": {
                                    "type": ["null", "object"],
                                    "properties": {
                                        "sha": {"type": ["null", "string"]},
                                        "url": {"type": ["null", "string"]},
                                    },
                                },
                                "protected": {"type": ["null", "boolean"]},
                                "protection": {
                                    "type": ["null", "object"],
                                    "properties": {
                                        "required_status_checks": {
                                            "type": ["null", "object"],
                                            "properties": {
                                                "contexts": {
                                                    "type": ["null", "array"],
                                                    "items": {"type": ["null", "string"]},
                                                },
                                                "enforcement_level": {
                                                    "type": ["null", "string"]
                                                },
                                            },
                                        }
                                    },
                                },
                                "repository": {"type": "string"},
                                "protection_url": {"type": ["null", "string"]},
                            },
                        },
                    },
                }
            ]
        }
    )
    s = catalog.streams[0]
    schema = s.spark_schema(include_system=True)
    assert schema["name"].dataType.typeName() == "string"
    assert schema["protected"].dataType.typeName() == "boolean"
    commit = schema["commit"].dataType
    assert commit.typeName() == "struct" and set(commit.fieldNames()) == {"sha", "url"}
    rsc = schema["protection"].dataType["required_status_checks"].dataType
    assert rsc.typeName() == "struct"
    contexts = rsc["contexts"].dataType
    assert contexts.typeName() == "array"
    assert contexts.elementType.typeName() == "string"
    # a parsed row round-trips through from_json with this schema
    wire = P.airbyte_wire_schema(s.spark_schema(include_system=False))
    line = (
        '{"type":"RECORD","record":{"stream":"branches","emitted_at":1,'
        '"data":{"name":"main","commit":{"sha":"abc","url":"u"},'
        '"protected":true,"protection":{"required_status_checks":'
        '{"contexts":["ci"],"enforcement_level":"strict"}},'
        '"repository":"acme/x","protection_url":null}}}'
    )
    row = (
        spark.createDataFrame([(line,)], "value string")
        .selectExpr("value")
        .select(F.from_json("value", wire).alias("m"))
        .select("m.record.data.*")
        .first()
    )
    assert row.commit.sha == "abc"
    assert row.protection.required_status_checks.contexts == ["ci"]
