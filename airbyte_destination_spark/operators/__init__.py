"""Dataflow operators: last-writer-wins reduce (plain + salted), routing."""

from airbyte_destination_spark.operators.dedup import (  # noqa: F401
    lww_reduce,
    lww_reduce_salted,
)
