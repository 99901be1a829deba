"""Similarity search over embedding columns (array<float>).

- `cosine_topk`: brute-force exact top-k — the correctness baseline.
  Dot products via zip_with/aggregate (JVM, codegen) in double
  precision; broadcast the (small) query side so the big side never
  shuffles.
- `lsh_topk`: random-hyperplane LSH approximate top-k — the scale
  path. Vectors are bucketed by a b-bit sign signature; only bucket-
  colliding pairs are scored, so cost ~ n * avg_bucket_size instead of
  n * q. Hyperplanes are deterministic (seeded hash), no driver state.
- `embedding_near_dup_pairs`: cosine >= threshold pairs via the same
  LSH bucketing — embedding-space near-duplicate detection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)


def _norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda s, x: s + x))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors per query (excluding self-matches).

    The query side is broadcast — the corpus is scanned once with no
    shuffle of the embedding payload; only (query_id, neighbor_id,
    score) rows reach the top-k reduce.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("nv")
    )
    pairs = c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id")).select(
        "query_id",
        "neighbor_id",
        (_dot(F.col("qv"), F.col("nv")) / (_norm(F.col("qv")) * _norm(F.col("nv")))).alias(
            "cos_raw"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_raw").desc(), F.col("neighbor_id").asc()
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cos_raw", 6).alias("cos_sim"), "rank")
    )


def _sign_signature(vec, dim: int, bits: int, seed: int):
    """b-bit random-hyperplane signature. Hyperplane j's component i is
    a deterministic pseudo-uniform in [-1,1) from xxhash64(i, j, seed) —
    no materialized hyperplane matrix, works at any scale."""
    def plane_dot(j):
        return F.aggregate(
            F.zip_with(
                vec,
                F.sequence(F.lit(1), F.lit(dim)),
                lambda x, i: x
                * (
                    (
                        F.pmod(F.xxhash64(i, F.lit(j), F.lit(seed)), F.lit(2_000_003))
                        / F.lit(1_000_001.5)
                    )
                    - F.lit(1.0)
                ),
            ),
            F.lit(0.0),
            lambda s, x: s + x,
        )

    sig = None
    for j in range(bits):
        bit = F.when(plane_dot(j) >= 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, j)
        sig = term if sig is None else sig.bitwiseOR(term)
    return sig


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    bits: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: score only pairs whose sign signatures collide.

    Recall < 1 by construction; raise recall with fewer bits or by
    probing neighboring buckets (not implemented). The bucket join
    shuffles by signature — sub-quadratic at corpus scale."""
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    ).withColumn("sig", _sign_signature(F.col("qv"), dim, bits, seed))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("nv")
    ).withColumn("sig", _sign_signature(F.col("nv"), dim, bits, seed))
    pairs = (
        c.join(q, "sig")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            (
                _dot(F.col("qv"), F.col("nv"))
                / (_norm(F.col("qv")) * _norm(F.col("nv")))
            ).alias("cos_raw"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_raw").desc(), F.col("neighbor_id").asc()
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cos_raw", 6).alias("cos_sim"), "rank")
    )


def embedding_near_dup_pairs(
    corpus: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    bits: int = 10,
    seed: int = 7,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (a < b) above threshold,
    candidate-filtered by LSH signature collision."""
    v = corpus.select(
        F.col(id_col).alias("doc"), _as_double(F.col(vec_col)).alias("v")
    ).withColumn("sig", _sign_signature(F.col("v"), dim, bits, seed))
    a, b = v.alias("a"), v.alias("b")
    return (
        a.join(b, (F.col("a.sig") == F.col("b.sig")) & (F.col("a.doc") < F.col("b.doc")))
        .select(
            F.col("a.doc").alias("doc_a"),
            F.col("b.doc").alias("doc_b"),
            (
                _dot(F.col("a.v"), F.col("b.v"))
                / (_norm(F.col("a.v")) * _norm(F.col("b.v")))
            ).alias("cos_raw"),
        )
        .where(F.col("cos_raw") >= threshold)
        .select("doc_a", "doc_b", F.round("cos_raw", 6).alias("cos_sim"))
    )
