"""Type-map matrix — parity with
/root/reference/internal/connector/types_test.go:12-70."""

import pytest
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
