"""Column-level functions: enrichment, validation, text analysis, similarity."""

from airbyte_destination_spark.functions.enrich import (  # noqa: F401
    enrich_records,
    raw_id_expr,
)
from airbyte_destination_spark.functions.validate import validate_tokens  # noqa: F401
