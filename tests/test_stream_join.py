"""Watermarked stream-stream interval join (streaming/joins.py):
cross-micro-batch matching through the join state store, and the
interval bounds, under a real availableNow run."""

import os
import time

from pyspark.sql import functions as F

from airbyte_destination_spark.streaming.joins import interval_join_stream

_S = "user_id long, ms long, side string"


def _write_batch(spark, d, name, rows):
    spark.createDataFrame(rows, _S).coalesce(1).write.parquet(f"{d}/{name}")
    time.sleep(1.1)  # distinct mtimes -> deterministic file-batch order


def test_interval_join_cross_batch_and_bounds(spark, tmp_path):
    src_dir = str(tmp_path / "src")
    os.makedirs(src_dir)
    # batch 1: two views; batch 2: purchases — the u1 match crosses the
    # micro-batch boundary through the left join buffer
    _write_batch(spark, src_dir, "b1", [(1, 1_000, "view"), (2, 500, "view")])
    _write_batch(
        spark,
        src_dir,
        "b2",
        [
            (1, 2_000, "purchase"),   # joins view@1000 (within 5s lookback)
            (2, 400, "purchase"),     # view@500 is AFTER it -> no pair
            (3, 9_000, "purchase"),   # no view at all
        ],
    )

    def src():
        return (
            spark.readStream.schema(_S)
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{src_dir}/*")
        )

    out = interval_join_stream(
        src().where(F.col("side") == "view").select("user_id", F.col("ms").alias("view_ms")),
        src().where(F.col("side") == "purchase").select("user_id", F.col("ms").alias("purchase_ms")),
        "user_id",
        "view_ms",
        "purchase_ms",
        lookback_ms=5_000,
        watermark="1 second",
    )
    work = str(tmp_path / "work")
    q = (
        out.writeStream.format("parquet")
        .option("path", f"{work}/out")
        .option("checkpointLocation", f"{work}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    got = sorted(
        (r.user_id, r.view_ms, r.purchase_ms)
        for r in spark.read.schema("user_id long, view_ms long, purchase_ms long")
        .parquet(f"{work}/out")
        .collect()
    )
    assert got == [(1, 1_000, 2_000)]
