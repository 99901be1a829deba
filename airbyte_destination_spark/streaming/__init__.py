"""Micro-batched CDC apply loop: batch replay + Structured Streaming front-end."""

from airbyte_destination_spark.streaming.pipeline import (  # noqa: F401
    IngestConfig,
    apply_change_batch,
    run_ingest_batches,
    run_ingest_stream,
)
from airbyte_destination_spark.streaming.sharded import (  # noqa: F401
    run_ingest_sharded,
    shard_change_log,
    shard_frontier,
)
