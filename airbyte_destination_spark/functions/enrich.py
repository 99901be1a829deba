"""Record enrichment: system columns added to every change record.

Reproduces getAirbyteRawID
(/root/reference/internal/connector/destination.go:502-510) bit-for-bit as
a JVM-side expression (golden values pinned from
destination_test.go:226-269), and `_airbyte_extracted_at` = emitted_at
(destination.go:422-424).

The reference's recordIndex is the 0-based position in the serial stdin
stream — order-dependent and hostile to parallelism. Our engine derives
the index from the total order the change log already carries
(`change_lsn`), which is deterministic and partition-parallel: no global
row_number, no single-partition window, no driver loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from airbyte_destination_spark import protocol as P


def raw_id_expr(
    namespace: Column | str,
    stream: Column | str,
    record_index: Column,
    emitted_at_ms: Column,
) -> Column:
    """UUID-shaped hex of sha256(ns \\0 stream \\0 index \\0 emittedAt).

    Exact port of the reference's hash recipe: components joined by a
    NUL byte, sha256, lowercase hex, formatted 8-4-4-4-12.
    """
    ns = F.lit(namespace) if isinstance(namespace, str) else namespace
    st = F.lit(stream) if isinstance(stream, str) else stream
    h = F.sha2(
        F.concat_ws(
            "\x00",
            F.coalesce(ns, F.lit("")),
            F.coalesce(st, F.lit("")),
            record_index.cast("string"),
            emitted_at_ms.cast("string"),
        ),
        256,
    )
    return F.concat_ws(
        "-",
        F.substring(h, 1, 8),
        F.substring(h, 9, 4),
        F.substring(h, 13, 4),
        F.substring(h, 17, 4),
        F.substring(h, 21, 12),
    )


def enrich_records(
    df: DataFrame,
    index_col: str = "change_lsn",
    namespace_col: str = "namespace",
    stream_col: str = "stream",
    emitted_at_col: str = "emitted_at",
) -> DataFrame:
    """Add `_airbyte_raw_id` + `_airbyte_extracted_at` (O4/O5).

    `emitted_at` is epoch milliseconds (protocol.go:252-258);
    `_airbyte_extracted_at` is its timestamp form (destination.go:424).
    Whole-stage-codegen friendly: sha2/concat/substring only, no UDF.
    """
    return df.withColumn(
        P.RAW_ID_COL,
        raw_id_expr(F.col(namespace_col), F.col(stream_col), F.col(index_col), F.col(emitted_at_col)),
    ).withColumn(
        P.EXTRACTED_AT_COL,
        F.timestamp_millis(F.col(emitted_at_col)),
    )
