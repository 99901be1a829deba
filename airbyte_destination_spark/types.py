"""Airbyte JSON-Schema property -> Spark type mapping.

Semantics of ConvertAirbyteTypeToPropelType
(/root/reference/internal/connector/types.go:11-50) re-targeted at Spark
types, with one deliberate upgrade: object/array properties keep a
structured Spark type where the declared item type allows it (the
reference stores serialized JSON strings; at 100 TB we want columnar
arrays, per BASELINE.json input_hint `tokens: array<int32>`).

Unit-test matrix parity: /root/reference/internal/connector/types_test.go:12-70.
"""

from __future__ import annotations

from pyspark.sql import types as T


class UnsupportedAirbyteType(ValueError):
    pass


_PRIMITIVES = {
    "boolean": T.BooleanType(),
    "number": T.DoubleType(),
    "integer": T.LongType(),
}


def _type_set(prop: dict) -> list[str]:
    """`type` may be a string or list of strings (custom unmarshaller at
    protocol.go:164-196); nulls are stripped (types.go:52-62)."""
    t = prop.get("type")
    if t is None:
        return []
    types = [t] if isinstance(t, str) else list(t)
    return [x for x in types if x != "null"]


def airbyte_to_spark_type(prop: dict) -> T.DataType:
    types = _type_set(prop)
    if len(types) == 0:
        return T.StringType()  # absent / null-only -> string default
    if len(types) > 1:
        return T.StringType()  # irreconcilable union -> string fallback
    t = types[0]
    if t == "string":
        fmt = prop.get("format")
        if fmt == "date":
            return T.DateType()
        if fmt == "date-time":
            return T.TimestampType()
        return T.StringType()  # incl. format=time (types.go:35-36)
    if t in _PRIMITIVES:
        return _PRIMITIVES[t]
    if t == "array":
        # structured upgrade: typed element where declared, else JSON string
        items = prop.get("items")
        if isinstance(items, dict):
            return T.ArrayType(airbyte_to_spark_type(items))
        return T.StringType()
    if t == "object":
        props = prop.get("properties")
        if isinstance(props, dict) and props:
            return T.StructType(
                [T.StructField(k, airbyte_to_spark_type(v), True) for k, v in props.items()]
            )
        return T.StringType()
    raise UnsupportedAirbyteType(
        f"airbyte type {t}:{prop.get('format', '')}:{prop.get('airbyte_type', '')} not supported"
    )
