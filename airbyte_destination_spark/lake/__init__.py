"""Bucketed copy-on-write lake table with atomic snapshot commits.

A from-scratch minimal table format (the container has no Iceberg/Delta
jars) reproducing the pieces of Iceberg the engine needs:

- versioned snapshot manifests with atomic commit (optimistic concurrency),
- hash-bucketed data layout so MERGE only rewrites touched buckets,
- schema evolution (add / widen) with per-file schema tracking,
- epoch-id idempotency markers in the snapshot (exactly-once),
- per-commit lineage rows (partition_id, lsn_range, rows_applied).

The reference delegates all of this to Propel/ClickHouse
(ReplacingMergeTree config at
/root/reference/internal/connector/destination.go:337-351); here it is
an explicit, Spark-native storage layer.
"""

from airbyte_destination_spark.lake.table import (  # noqa: F401
    CommitConflict,
    LakeTable,
    MergeStats,
)
from airbyte_destination_spark.lake.schema import (  # noqa: F401
    align_to_schema,
    merge_schemas,
)
from airbyte_destination_spark.lake.txn_catalog import TxnCatalog  # noqa: F401
