"""Golden raw-id values pinned from
/root/reference/internal/connector/destination_test.go:226-269."""

from pyspark.sql import functions as F

from airbyte_destination_spark.functions.enrich import enrich_records, raw_id_expr

GOLDEN = [
    ("namespace", "stream", 1, 123456789, "64835b23-1e43-d091-c9b0-de411c0d4364"),
    ("namespace", "stream", 2, 123456789, "8b7e81a5-412e-3f3e-f045-bc0c440bdc02"),
    ("namespace", "stream", 1, 1323456789, "245b33d5-9c69-cdfb-ae06-d1b753d62f1c"),
]


def test_raw_id_golden(spark):
    df = spark.createDataFrame(
        [(ns, st, idx, ts) for ns, st, idx, ts, _ in GOLDEN],
        "namespace string, stream string, idx long, emitted long",
    )
    got = df.select(
        raw_id_expr(F.col("namespace"), F.col("stream"), F.col("idx"), F.col("emitted")).alias(
            "raw_id"
        )
    ).collect()
    assert [r.raw_id for r in got] == [g[4] for g in GOLDEN]


def test_enrich_adds_system_columns(spark):
    df = spark.createDataFrame(
        [("train", "sequences", 7, 1_700_000_000_123)],
        "namespace string, stream string, change_lsn long, emitted_at long",
    )
    out = enrich_records(df).collect()[0]
    assert out["_airbyte_raw_id"] is not None
    assert len(out["_airbyte_raw_id"]) == 36
    # ms precision preserved through timestamp_millis
    assert out["_airbyte_extracted_at"].microsecond == 123000
