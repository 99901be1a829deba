"""Deterministic synthetic CDC change log over the tokenized-sequences table.

Shape per BASELINE.json input_hint / FIXTURES.md F2: Airbyte-envelope
rows (op I/U/D, change_lsn total order, emitted_at ms) whose `data`
payload is (doc_id, tokens array<int32>, n_tok, source).

Everything is derived from `spark.range(n)` with hash mixing — no driver
data, no RNG state, no Python in the row path — so the same (seed, n)
always produces the same log at any parallelism and any scale up to
10^10 rows. `doc_id` draws from a power-law (Zipf-ish) distribution to
exercise hot-key salting.

The reference's analogue is its fixture file
/root/reference/internal/connector/test_files/input_data.txt (61 static
lines); ours is parameterized because the target is 10^10 events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SOURCES = ["web", "books", "code", "wiki"]
VOCAB = 50_000


def _u01(*cols) -> "F.Column":
    """Deterministic uniform [0,1) from hashing the given columns."""
    return (F.pmod(F.xxhash64(*cols), F.lit(1_000_000_007)) / F.lit(1_000_000_007.0)).cast(
        "double"
    )


def change_events(
    spark: SparkSession,
    n_events: int,
    n_docs: int,
    seed: int = 42,
    delete_frac: float = 0.05,
    skew: float = 2.0,
    max_tokens: int = 64,
    stream: str = "sequences",
    namespace: str = "train",
    num_partitions: int | None = None,
) -> DataFrame:
    """One RECORD row per event, ordered by change_lsn = event index.

    skew > 1 concentrates updates on low doc ids (power-law hot keys);
    skew = 1 is uniform.
    """
    df = spark.range(0, n_events, numPartitions=num_partitions)
    sd = F.lit(seed)

    u_doc = _u01(F.col("id"), sd, F.lit("doc"))
    doc_idx = F.least(
        F.floor(F.pow(u_doc, F.lit(skew)) * n_docs).cast("long"), F.lit(n_docs - 1)
    )
    u_op = _u01(F.col("id"), sd, F.lit("op"))
    u_len = _u01(F.col("id"), sd, F.lit("len"))
    n_tok = (F.floor(u_len * (max_tokens - 1)) + 1).cast("int")

    # token i of event e = hash(doc, lsn, i) mod VOCAB — changes on every
    # update, so final-state token equality proves the right lsn won
    tokens = F.transform(
        F.sequence(F.lit(1), n_tok),
        lambda i: F.pmod(F.xxhash64(doc_idx, F.col("id"), i, sd), F.lit(VOCAB)).cast("int"),
    )

    return df.select(
        F.lit("RECORD").alias("type"),
        F.lit(stream).alias("stream"),
        F.lit(namespace).alias("namespace"),
        F.when(u_op < delete_frac, F.lit("D"))
        .when(u_op < delete_frac + 0.3, F.lit("I"))
        .otherwise(F.lit("U"))
        .alias("op"),
        F.col("id").alias("change_lsn"),
        (F.lit(1_700_000_000_000) + F.col("id")).alias("emitted_at"),
        F.struct(
            F.concat(F.lit("doc-"), F.lpad(doc_idx.cast("string"), 9, "0")).alias("doc_id"),
            F.when(u_op < delete_frac, F.lit(None).cast("array<int>")).otherwise(tokens).alias(
                "tokens"
            ),
            F.when(u_op < delete_frac, F.lit(None).cast("int"))
            .otherwise(F.size(tokens).cast("int"))
            .alias("n_tok"),
            F.element_at(
                F.array(*[F.lit(s) for s in SOURCES]),
                (F.pmod(F.xxhash64(doc_idx, F.lit("src"), sd), F.lit(len(SOURCES))) + 1).cast(
                    "int"
                ),
            ).alias("source"),
        ).alias("data"),
        F.lit(None).cast("string").alias("state"),
    )


def write_change_log(
    spark: SparkSession,
    out_dir: str,
    n_events: int,
    n_docs: int,
    n_batches: int = 4,
    seed: int = 42,
    files_per_batch: int = 32,
    **kwargs,
) -> list[str]:
    """Materialize the log as `n_batches` parquet directories of
    contiguous lsn ranges — the at-rest form a binlog tail would land in.
    Returns the batch directories in lsn order.

    `files_per_batch` bounds file size from above via maxRecordsPerFile:
    AQE coalescing otherwise lands a small batch as 1-4 single-row-group
    files, and parquet splits at row-group granularity — a reader could
    then scan the batch with at most that many tasks regardless of
    cluster width (a real binlog tail is many small files too)."""
    df = change_events(spark, n_events, n_docs, seed=seed, **kwargs)
    per = (n_events + n_batches - 1) // n_batches
    per_file = max(per // max(files_per_batch, 1), 1)
    dirs = []
    for b in range(n_batches):
        lo, hi = b * per, min((b + 1) * per, n_events)
        path = f"{out_dir}/batch-{b:05d}"
        df.where((F.col("change_lsn") >= lo) & (F.col("change_lsn") < hi)).write.option(
            "maxRecordsPerFile", per_file
        ).mode("overwrite").parquet(path)
        dirs.append(path)
    return dirs
