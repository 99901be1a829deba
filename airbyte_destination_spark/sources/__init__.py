"""Sources: synthetic change-log generator + NDJSON/parquet change-log readers."""

from airbyte_destination_spark.sources.changegen import change_events  # noqa: F401
from airbyte_destination_spark.sources.changelog import (  # noqa: F401
    read_changelog_json,
    read_changelog_parquet,
)
