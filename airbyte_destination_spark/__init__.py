"""airbyte_destination_spark — a PySpark-native CDC / incremental-ingest engine.

From-scratch re-expression of the semantics of propeldata/airbyte-destination
(an Airbyte destination connector that streams change records into
ClickHouse ReplacingMergeTree tables) as an idiomatic Spark pipeline:

    change-event log  ->  normalize/validate (Arrow pandas UDFs)
                      ->  repartition by key (+ salt for skew)
                      ->  last-writer-wins window reduce
                      ->  bucketed copy-on-write MERGE into a lake table
                      ->  epoch-manifest exactly-once commit + lineage

See SURVEY.md for the full operator-by-operator mapping to the reference.
"""

__version__ = "0.1.0"

from airbyte_destination_spark.session import get_spark  # noqa: F401
