"""Change-log readers: NDJSON (the reference's wire format) and parquet.

The reference scans stdin line-by-line with bufio + json.Unmarshal
(/root/reference/internal/connector/destination.go:393-400). Here the
scan is a distributed `spark.read.text` + one `from_json` expression —
parsing happens JVM-side across all partitions, and malformed lines are
quarantined instead of aborting the sync (the reference aborts with the
failing record's index; we keep its diagnosability by carrying the raw
line through).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from airbyte_destination_spark.protocol import envelope_schema


def read_changelog_json(
    spark: SparkSession,
    path_or_df: str | DataFrame,
    data_schema: T.StructType,
) -> tuple[DataFrame, DataFrame]:
    """Parse an NDJSON change log into (records, corrupt).

    `records` has the envelope columns with a typed `data` struct;
    `corrupt` carries the unparseable raw lines (type missing after
    parse == parse failure, since `type` is required on every message).
    """
    if isinstance(path_or_df, str):
        lines = spark.read.text(path_or_df)
    else:
        lines = path_or_df  # a DataFrame with a single `value` string column
    env = envelope_schema(data_schema)
    parsed = lines.select(
        F.col("value"),
        F.from_json(F.col("value"), env, {"mode": "PERMISSIVE"}).alias("msg"),
    )
    ok = parsed.where(F.col("msg.type").isNotNull()).select("msg.*")
    corrupt = parsed.where(F.col("msg.type").isNull()).select(F.col("value").alias("raw_line"))
    return ok, corrupt


def read_changelog_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Read an at-rest parquet change log (as written by changegen)."""
    return spark.read.parquet(path)


def records_only(envelopes: DataFrame) -> DataFrame:
    """Type router (destination.go:402-454): keep RECORD rows, flatten the
    payload next to the envelope columns."""
    return envelopes.where(F.col("type") == "RECORD").select(
        "stream", "namespace", "op", "change_lsn", "emitted_at", "data.*"
    )
