"""applyInPandasWithState sessionization: state carries open sessions
across micro-batches; closed sessions emit exactly once."""

import time

from pyspark.sql import functions as F


def test_stateful_sessionize_across_batches(spark, tmp_path):
    from airbyte_destination_spark.streaming.stateful import GAP_MS, sessionize_stream

    src = str(tmp_path / "src")
    # batch 1: user 1 has two events 1 min apart (one open session);
    # user 2 has one event
    spark.createDataFrame(
        [(1, 0), (1, 60_000), (2, 0)], "user_id long, ts_ms long"
    ).write.mode("overwrite").parquet(f"{src}/b1")

    stream = spark.readStream.schema("user_id long, ts_ms long").option(
        "maxFilesPerTrigger", "1000"
    ).parquet(f"{src}/b*")
    q = (
        sessionize_stream(stream)
        .writeStream.format("memory")
        .queryName("sessions")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        q.processAllAvailable()
        assert spark.sql("SELECT * FROM sessions").count() == 0  # nothing closed yet

        # batch 2: user 1 comes back AFTER the gap -> old session closes
        spark.createDataFrame(
            [(1, GAP_MS + 120_000)], "user_id long, ts_ms long"
        ).write.mode("overwrite").parquet(f"{src}/b2")
        deadline = time.time() + 60
        while time.time() < deadline:
            q.processAllAvailable()
            rows = spark.sql(
                "SELECT * FROM sessions WHERE user_id = 1"
            ).collect()
            if rows:
                break
            time.sleep(0.5)
        assert rows, "closed session was not emitted"
        assert rows[0].session_start_ms == 0
        assert rows[0].session_end_ms == 60_000
        assert rows[0].n_events == 2
    finally:
        q.stop()
