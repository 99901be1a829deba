"""Debezium CDC envelope adapter — the public binlog/WAL wire format.

The reference consumes only the Airbyte message envelope
(/root/reference/internal/protocol/protocol.go:21-29); a binlog/WAL
tail in the wild almost always arrives as Debezium change events
(https://debezium.io/documentation — `before`/`after` images, an `op`
code, and a `source` block carrying the log position). This adapter
normalizes that format into the engine's internal change shape
(stream, namespace, op I/U/D, change_lsn, emitted_at, data) so every
downstream stage — validation, enrichment, bucketed merge, lineage —
is format-agnostic.

Shape decisions, all JVM-side (one `from_json` + projections; no
Python in the path):

- Both wrappings are accepted in one pass: Kafka-Connect
  `{"schema":..., "payload": {...}}` and the unwrapped event produced
  with `schemas.enable=false`. Fields are taken from `payload.*` when
  the payload struct parsed, else from the top level.
- `op` mapping: `c` (create) and `r` (snapshot read) -> I, `u` -> U,
  `d` -> D. Anything else (`t` truncate, `m` message) is quarantined,
  not dropped — an unmodeled op silently vanishing would corrupt the
  replayed state.
- The row image is `after` for I/U and `before` for D (a Debezium
  delete's `after` is null; the key lives in `before`).
- `change_lsn` = coalesce(source.lsn, source.pos, source.ts_ms,
  envelope ts_ms): Postgres publishes `lsn`, MySQL `pos` (callers
  replaying multi-file MySQL binlogs should pre-compose file+pos into
  a single long — `pos` alone is only ordered within one binlog
  file); `source.ts_ms` (the db commit time) orders connectors that
  publish neither, and the envelope's ts_ms (Kafka-Connect processing
  time) is strictly the last resort — processing time can reorder
  redelivered events.
- Kafka log-compaction tombstones (empty value / literal `null` after
  a delete) are dropped, not quarantined: they carry no payload by
  design and the preceding `d` event already encoded the delete.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def debezium_source_schema() -> T.StructType:
    """The `source` block fields this adapter reads (a real event carries
    more; from_json ignores extras)."""
    return T.StructType(
        [
            T.StructField("ts_ms", T.LongType(), True),
            T.StructField("lsn", T.LongType(), True),   # postgres
            T.StructField("pos", T.LongType(), True),   # mysql
            T.StructField("file", T.StringType(), True),
            T.StructField("db", T.StringType(), True),
            T.StructField("schema", T.StringType(), True),
            T.StructField("table", T.StringType(), True),
            T.StructField("snapshot", T.StringType(), True),
        ]
    )


def debezium_transaction_schema() -> T.StructType:
    """The `transaction` block Debezium attaches when
    `provides.transaction.metadata=true`: the source transaction id and
    the event's order within it — the public wire contract behind
    whole-transaction-atomic apply (streaming/txn.py)."""
    return T.StructType(
        [
            T.StructField("id", T.StringType(), True),
            T.StructField("total_order", T.LongType(), True),
            T.StructField("data_collection_order", T.LongType(), True),
        ]
    )


def _event_schema(data_schema: T.StructType) -> T.StructType:
    """One change event: before/after images + op + source + txn."""
    return T.StructType(
        [
            T.StructField("before", data_schema, True),
            T.StructField("after", data_schema, True),
            T.StructField("source", debezium_source_schema(), True),
            T.StructField("op", T.StringType(), True),
            T.StructField("ts_ms", T.LongType(), True),
            T.StructField("transaction", debezium_transaction_schema(), True),
        ]
    )


def debezium_envelope_schema(data_schema: T.StructType) -> T.StructType:
    """Wire schema accepting wrapped and unwrapped events in one parse:
    the unwrapped fields sit at the top level next to an optional
    `payload` struct holding the wrapped ones."""
    ev = _event_schema(data_schema)
    return T.StructType(
        [T.StructField("payload", ev, True)] + list(ev.fields)
    )


def read_debezium_json(
    spark: SparkSession,
    path_or_df: str | DataFrame,
    data_schema: T.StructType,
) -> tuple[DataFrame, DataFrame]:
    """Parse a Debezium NDJSON change stream into (records, corrupt).

    `records` carries the engine's internal change shape:
    (stream, namespace, op I/U/D, change_lsn, emitted_at, data struct)
    — identical to `changelog.records_only` output, so the two formats
    are interchangeable upstream of the merge.

    `corrupt` quarantines unparseable lines, unmapped op codes, and
    events whose required image is missing (after for I/U, before for
    D), each with the raw line for diagnosability. Compaction
    tombstones are dropped silently (see module docstring).
    """
    if isinstance(path_or_df, str):
        lines = spark.read.text(path_or_df)
    else:
        lines = path_or_df  # single `value` string column
    env = debezium_envelope_schema(data_schema)
    non_tombstone = lines.where(
        F.col("value").isNotNull()
        & (F.trim(F.col("value")) != "")
        & (F.trim(F.col("value")) != "null")
    )
    parsed = non_tombstone.select(
        F.col("value"),
        F.from_json(F.col("value"), env, {"mode": "PERMISSIVE"}).alias("m"),
    )
    # wrapped wins when present; else the top-level (unwrapped) fields
    use_payload = F.col("m.payload").isNotNull() & (
        F.col("m.payload.op").isNotNull()
        | F.col("m.payload.after").isNotNull()
        | F.col("m.payload.before").isNotNull()
    )

    def pick(field: str):
        return F.when(use_payload, F.col(f"m.payload.{field}")).otherwise(
            F.col(f"m.{field}")
        )

    norm = parsed.select(
        "value",
        pick("op").alias("dbz_op"),
        pick("before").alias("before"),
        pick("after").alias("after"),
        pick("source").alias("source"),
        pick("ts_ms").alias("ts_ms"),
        pick("transaction").alias("transaction"),
    )
    op = (
        F.when(F.col("dbz_op").isin("c", "r"), F.lit("I"))
        .when(F.col("dbz_op") == "u", F.lit("U"))
        .when(F.col("dbz_op") == "d", F.lit("D"))
    )
    data = F.when(F.col("dbz_op") == "d", F.col("before")).otherwise(F.col("after"))
    shaped = norm.select(
        "value",
        F.col("source.table").alias("stream"),
        F.coalesce(F.col("source.schema"), F.col("source.db")).alias("namespace"),
        op.alias("op"),
        # ordering fallback chain ends at the SOURCE's commit time
        # (source.ts_ms), never the envelope's ts_ms: the envelope
        # timestamp is Kafka-Connect processing time, and a redelivered
        # event re-stamped with a newer processing time would win an
        # LWW replay over a genuinely newer change. The envelope ts_ms
        # is only the very last resort when the source block carries no
        # time at all.
        F.coalesce(
            F.col("source.lsn"), F.col("source.pos"),
            F.col("source.ts_ms"), F.col("ts_ms"),
        ).alias("change_lsn"),
        F.coalesce(F.col("ts_ms"), F.col("source.ts_ms")).alias("emitted_at"),
        # transaction id when the connector publishes txn metadata;
        # NULL = auto-commit (a single-event transaction). Callers
        # feeding apply_txn_log make those explicit with
        # `coalesce(txn_id, concat('auto-', change_lsn))` so every
        # event belongs to exactly one transaction.
        F.col("transaction.id").alias("txn_id"),
        data.alias("data"),
    )
    ok_pred = F.col("op").isNotNull() & F.col("data").isNotNull()
    records = shaped.where(ok_pred).drop("value")
    corrupt = shaped.where(~ok_pred).select(F.col("value").alias("raw_line"))
    return records, corrupt


def to_debezium_json(
    df: DataFrame,
    op_col: str = "op",
    lsn_col: str = "change_lsn",
    table: str = "t",
    db: str = "db",
    wrapped_pred=None,
    txn_col: str | None = None,
) -> DataFrame:
    """Inverse adapter for tests/benchmarks: render an internal-shape
    change DataFrame (op I/U/D + data columns) as Debezium NDJSON
    lines. `wrapped_pred` (optional bool Column) selects per-row
    whether the event is Kafka-Connect-wrapped or unwrapped, so a
    synthesized log exercises both parse paths. `txn_col` (optional)
    renders the `transaction` metadata block from that column
    (NULL values render as auto-commit events with no block)."""
    data_cols = [c for c in df.columns if c not in (op_col, lsn_col, txn_col)]
    image = F.struct(*[F.col(c) for c in data_cols])
    is_d = F.col(op_col) == "D"
    event = F.struct(
        F.when(is_d, image).alias("before"),
        F.when(~is_d, image).alias("after"),
        F.struct(
            F.lit(None).cast("long").alias("ts_ms"),
            F.col(lsn_col).cast("long").alias("lsn"),
            F.lit(None).cast("long").alias("pos"),
            F.lit(None).cast("string").alias("file"),
            F.lit(db).alias("db"),
            F.lit(None).cast("string").alias("schema"),
            F.lit(table).alias("table"),
            F.lit(None).cast("string").alias("snapshot"),
        ).alias("source"),
        F.when(is_d, F.lit("d"))
        .when(F.col(op_col) == "U", F.lit("u"))
        .otherwise(F.lit("c"))
        .alias("op"),
        F.col(lsn_col).cast("long").alias("ts_ms"),
        *(
            [
                F.when(
                    F.col(txn_col).isNotNull(),
                    F.struct(
                        F.col(txn_col).cast("string").alias("id"),
                        F.lit(None).cast("long").alias("total_order"),
                        F.lit(None).cast("long").alias("data_collection_order"),
                    ),
                ).alias("transaction")
            ]
            if txn_col is not None
            else []
        ),
    )
    wrapped = F.to_json(F.struct(event.alias("payload")))
    flat = F.to_json(event)
    if wrapped_pred is None:
        wrapped_pred = F.lit(True)
    return df.select(F.when(wrapped_pred, wrapped).otherwise(flat).alias("value"))
