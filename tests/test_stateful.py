"""applyInPandasWithState sessionization: state carries open sessions
across micro-batches; closed sessions emit exactly once.

Bounded pattern (round-2 fix): each micro-batch is delivered by a
separate `trigger(availableNow=True)` run over the SAME checkpoint into
a fault-tolerant parquet sink, so every run terminates on its own — no
processingTime trigger, no processAllAvailable spin (the round-1 suite
hang; see stateful.py's docstring for why EventTimeTimeout is load-
bearing here).
"""

from pyspark.sql import Window
from pyspark.sql import functions as F


def _run_once(spark, src, ckpt, out, timeout=180):
    stream = (
        spark.readStream.schema("user_id long, ts_ms long")
        .option("maxFilesPerTrigger", "1000")
        .parquet(f"{src}/b*")
    )
    from airbyte_destination_spark.streaming.stateful import sessionize_stream

    q = (
        sessionize_stream(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    try:
        assert q.awaitTermination(timeout), "bounded run did not terminate"
    finally:
        q.stop()


def _read_out(spark, out):
    try:
        return spark.read.schema(
            "user_id long, session_start_ms long, session_end_ms long, n_events long"
        ).parquet(out).collect()
    except Exception:
        return []


# event times sit at a realistic epoch: ts at exactly epoch 0 equals the
# initial watermark and is dropped as late data (correct streaming
# semantics, degenerate test input)
BASE = 1_700_000_000_000


def test_stateful_sessionize_across_batches(spark, tmp_path):
    from airbyte_destination_spark.streaming.stateful import GAP_MS

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    # batch 1: user 1 has two events 1 min apart (one open session);
    # user 2 has one event
    spark.createDataFrame(
        [(1, BASE), (1, BASE + 60_000), (2, BASE)], "user_id long, ts_ms long"
    ).write.mode("overwrite").parquet(f"{src}/b1")
    _run_once(spark, src, ckpt, out)
    assert len(_read_out(spark, out)) == 0  # nothing closed yet

    # batch 2: user 1 comes back AFTER the gap -> old session closes
    spark.createDataFrame(
        [(1, BASE + GAP_MS + 120_000)], "user_id long, ts_ms long"
    ).write.mode("overwrite").parquet(f"{src}/b2")
    _run_once(spark, src, ckpt, out)
    rows = [r for r in _read_out(spark, out) if r.user_id == 1]
    assert rows, "closed session was not emitted"
    assert rows[0].session_start_ms == BASE
    assert rows[0].session_end_ms == BASE + 60_000
    assert rows[0].n_events == 2


def test_stateful_matches_batch_sessionize(spark, tmp_path):
    """Streaming fold == batch lag/cumsum sessionization on one batch
    whose final event per user is a far-future sentinel, so every real
    session closes within the run."""
    import random

    from airbyte_destination_spark.streaming.stateful import GAP_MS

    rng = random.Random(7)
    rows = []
    for user in range(1, 6):
        t = BASE
        for _ in range(40):
            t += rng.choice([1000, 60_000, GAP_MS + 1])
            rows.append((user, t))
    # one COMMON far-future sentinel per user closes every real session
    # via the fold; being common, the global watermark (max - gap) stays
    # below every sentinel session's timeout deadline, so no open
    # sentinel session is also emitted by timeout
    sentinel = max(t for _, t in rows) + 10 * GAP_MS
    rows.extend((user, sentinel) for user in range(1, 6))
    df = spark.createDataFrame(rows, "user_id long, ts_ms long")

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    df.write.mode("overwrite").parquet(f"{src}/b1")
    _run_once(spark, src, str(tmp_path / "ckpt"), out)
    got = {
        (r.user_id, r.session_start_ms, r.session_end_ms, r.n_events)
        for r in _read_out(spark, out)
    }

    # batch twin: lag/gap-flag cumsum (same shape as the `sessionize` query)
    w = Window.partitionBy("user_id").orderBy("ts_ms")
    gap = F.when(
        (F.col("ts_ms") - F.lag("ts_ms").over(w)) > GAP_MS, F.lit(1)
    ).otherwise(F.lit(0))
    sess = F.sum(gap).over(w.rowsBetween(Window.unboundedPreceding, 0))
    batch = (
        df.withColumn("sid", sess)
        .groupBy("user_id", "sid")
        .agg(
            F.min("ts_ms").alias("s"),
            F.max("ts_ms").alias("e"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    # drop each user's LAST session (the open one holding the sentinel)
    wlast = Window.partitionBy("user_id").orderBy(F.col("sid").desc())
    closed = batch.withColumn("rk", F.row_number().over(wlast)).where("rk > 1")
    want = {(r.user_id, r.s, r.e, r.n) for r in closed.collect()}
    assert got == want
