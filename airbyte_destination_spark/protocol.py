"""Airbyte protocol surface: message envelope schema, catalog/config model.

From-scratch re-expression of the reference's wire model
(/root/reference/internal/airbyte/protocol.go:21-29,92-115,219-263) as
Spark schemas + plain dataclasses. Message parsing is `from_json` on a
DataFrame — never per-row Python.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

from pyspark.sql import types as T

from airbyte_destination_spark.types import airbyte_to_spark_type

# message types (protocol.go:12-19)
TYPE_RECORD = "RECORD"
TYPE_STATE = "STATE"
TYPE_LOG = "LOG"

# destination sync modes (protocol.go / destination.go:329-351)
MODE_APPEND = "append"
MODE_APPEND_DEDUP = "append_dedup"
MODE_OVERWRITE = "overwrite"

# system columns the destination adds to every record
# (destination.go:23-26)
RAW_ID_COL = "_airbyte_raw_id"
EXTRACTED_AT_COL = "_airbyte_extracted_at"


def envelope_schema(data_schema: T.StructType) -> T.StructType:
    """Spark schema of one change-log line: Airbyte RECORD/STATE envelope
    with a typed `data` payload plus CDC extension columns (op, change_lsn).

    The reference parses the same envelope one JSON line at a time
    (destination.go:394-400); here it is a single `from_json` column
    expression evaluated JVM-side.
    """
    return T.StructType(
        [
            T.StructField("type", T.StringType(), False),
            T.StructField("stream", T.StringType(), True),
            T.StructField("namespace", T.StringType(), True),
            T.StructField("op", T.StringType(), True),  # I / U / D
            T.StructField("change_lsn", T.LongType(), True),
            T.StructField("emitted_at", T.LongType(), True),  # epoch ms
            T.StructField("data", data_schema, True),
            # STATE payload: opaque checkpoint blob echoed back
            T.StructField("state", T.StringType(), True),
        ]
    )


def airbyte_wire_schema(data_schema: T.StructType) -> T.StructType:
    """Schema of one line of the REAL Airbyte NDJSON wire format
    (protocol.go:21-29): payload nested under `record` / `state`.

        {"type":"RECORD","record":{"stream":...,"namespace":...,
                                   "emitted_at":...,"data":{...}}}
        {"type":"STATE","state":{...}}
    """
    return T.StructType(
        [
            T.StructField("type", T.StringType(), False),
            T.StructField(
                "record",
                T.StructType(
                    [
                        T.StructField("stream", T.StringType(), True),
                        T.StructField("namespace", T.StringType(), True),
                        T.StructField("emitted_at", T.LongType(), True),
                        T.StructField("data", data_schema, True),
                    ]
                ),
                True,
            ),
            T.StructField("state", T.StringType(), True),
        ]
    )


@dataclass
class ConfiguredStream:
    """One stream + its sync policy (protocol.go:237-244)."""

    name: str
    namespace: str = ""
    json_schema: dict = field(default_factory=dict)
    sync_mode: str = "incremental"
    destination_sync_mode: str = MODE_APPEND
    primary_key: list[list[str]] = field(default_factory=list)
    cursor_field: list[str] = field(default_factory=list)
    # Engine-selection extension beyond the 3 Airbyte modes — the
    # analog of the reference shipping TableSettings engine config to
    # its warehouse (ReplacingMergeTree at destination.go:337-351;
    # ClickHouse's Summing/AggregatingMergeTree are the same knob).
    # Honored for append_dedup streams only: "lww" (default),
    # "partial" (NULL columns inherit), or "aggregate" (per-column
    # declared folds from agg_spec).
    merge_engine: str = "lww"
    agg_spec: dict = field(default_factory=dict)

    @property
    def table_name(self) -> str:
        """namespace_name, or bare name when namespace is empty
        (destination.go:494-500)."""
        return f"{self.namespace}_{self.name}" if self.namespace else self.name

    @property
    def key_cols(self) -> list[str]:
        # reference uses only the first element of each key path
        # (destination.go:283-291 takes pk[i][0])
        return [pk[0] for pk in self.primary_key]

    @property
    def version_col(self) -> str:
        """The ReplacingMergeTree `Ver` column: the cursor field, or
        `_airbyte_extracted_at` when none is set (destination.go:293-296)."""
        if self.cursor_field:
            return self.cursor_field[0]
        return EXTRACTED_AT_COL

    def validate(self) -> None:
        """Mode x key compatibility checks (destination.go:246-254,324-327)."""
        if self.destination_sync_mode == MODE_APPEND_DEDUP and not self.primary_key:
            raise ValueError(
                f"stream {self.table_name!r}: append_dedup requires at least one primary key"
            )
        if self.destination_sync_mode not in (MODE_APPEND, MODE_APPEND_DEDUP, MODE_OVERWRITE):
            raise ValueError(
                f"stream {self.table_name!r}: unsupported destination_sync_mode "
                f"{self.destination_sync_mode!r}"
            )
        if self.merge_engine not in ("lww", "partial", "aggregate"):
            raise ValueError(
                f"stream {self.table_name!r}: unsupported merge_engine "
                f"{self.merge_engine!r}"
            )
        if self.merge_engine != "lww" and self.destination_sync_mode != MODE_APPEND_DEDUP:
            raise ValueError(
                f"stream {self.table_name!r}: merge_engine {self.merge_engine!r} "
                "requires the append_dedup destination sync mode"
            )
        if self.merge_engine == "aggregate" and not self.agg_spec:
            raise ValueError(
                f"stream {self.table_name!r}: merge_engine 'aggregate' requires agg_spec"
            )

    def spark_schema(self, include_system: bool = True) -> T.StructType:
        """Catalog JSON-Schema -> Spark StructType, with the reference's
        nullability rule: a column is non-null iff it is a PK column or
        the cursor field (destination.go:310)."""
        fields = []
        props = self.json_schema.get("properties", {})
        keyish = set(self.key_cols) | set(self.cursor_field[:1])
        for col_name, prop in props.items():
            dtype = airbyte_to_spark_type(prop)
            fields.append(T.StructField(col_name, dtype, col_name not in keyish))
        if include_system:
            fields.append(T.StructField(RAW_ID_COL, T.StringType(), False))
            fields.append(T.StructField(EXTRACTED_AT_COL, T.TimestampType(), False))
        return T.StructType(fields)


@dataclass
class ConfiguredCatalog:
    streams: list[ConfiguredStream] = field(default_factory=list)

    @classmethod
    def from_dict(cls, d: dict) -> ConfiguredCatalog:
        streams = []
        for cs in d.get("streams", []):
            s = cs.get("stream", {})
            streams.append(
                ConfiguredStream(
                    name=s.get("name", ""),
                    namespace=s.get("namespace") or "",
                    json_schema=s.get("json_schema", {}),
                    sync_mode=cs.get("sync_mode", "incremental"),
                    destination_sync_mode=cs.get("destination_sync_mode", MODE_APPEND),
                    primary_key=cs.get("primary_key", []) or [],
                    cursor_field=cs.get("cursor_field", []) or [],
                    merge_engine=cs.get("merge_engine", "lww"),
                    agg_spec=cs.get("agg_spec", {}) or {},
                )
            )
        return cls(streams)

    @classmethod
    def from_path(cls, path: str) -> ConfiguredCatalog:
        """UnmarshalFromPath parity (internal/connector/parser.go:8-15)."""
        with open(path) as f:
            return cls.from_dict(json.load(f))


@dataclass
class Config:
    """Destination config (internal/connector/config.go). The reference
    needs Propel API credentials; our engine needs a warehouse path."""

    warehouse: str
    n_buckets: int = 32

    @classmethod
    def from_path(cls, path: str) -> Config:
        with open(path) as f:
            d = json.load(f)
        if "warehouse" not in d:
            raise ValueError("config missing required field 'warehouse'")
        return cls(warehouse=d["warehouse"], n_buckets=int(d.get("n_buckets", 32)))
