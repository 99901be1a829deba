"""Similarity search over embedding columns (array<float>).

- `cosine_topk`: brute-force exact top-k — the correctness baseline.
  Dot products via zip_with/aggregate (JVM, codegen) in double
  precision; broadcast the (small) query side so the big side never
  shuffles.
- `lsh_topk`: banded random-hyperplane LSH approximate top-k — the
  scale path. The signature is split into `bands` independent
  sub-signatures (multi-table LSH); vectors colliding in ANY band are
  candidates, so recall is 1-(1-p^r)^b instead of p^(r*b) of a single
  full-signature table (the round-1 design, which at b bits had only
  2^b buckets for the whole corpus — giant-bucket quadratic joins).
  Over-full buckets (degenerate clusters, e.g. all-zero vectors) are
  capped: they are dropped from the candidate join with their size
  logged, keeping every bucket join O(cap^2) at any corpus size.
- `embedding_near_dup_pairs`: cosine >= threshold pairs via the same
  banded bucketing — embedding-space near-duplicate detection.

Hyperplanes are a deterministic md5-derived matrix computed once at
plan-build time (driver side); sign signatures come from ONE
Arrow-batched pandas UDF doing a (batch x dim) @ (dim x planes) matmul
— dense linear algebra is the one place vectorized Python beats the
built-in expression tree (higher-order functions evaluate interpreted,
per element). Candidate-pair cosine scoring is likewise one Arrow
batch (`_cos_pairs`); only the exact `cosine_topk` baseline keeps the
JVM zip_with/aggregate fold. The DuckDB oracle embeds the same plane
doubles, so signatures reproduce bit-for-bit across engines.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)


def _norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda s, x: s + x))


@F.pandas_udf(T.DoubleType())
def _cos_pairs(va: pd.Series, vb: pd.Series) -> pd.Series:
    """Vectorized cosine over candidate pairs — one Arrow batch in, one
    (rows x dim) x (rows x dim) row-wise product out. The built-in
    zip_with/aggregate fold evaluates interpreted per element (~128
    lambda invocations per pair), which dominated the near-dup query
    wall time once candidates reached ~10^6; numpy differs from the
    sequential fold only in the last ulp (round(6) downstream)."""
    import numpy as np

    if len(va) == 0:
        return pd.Series([], dtype=float)
    a = np.stack([np.asarray(v, dtype=np.float64) for v in va])
    b = np.stack([np.asarray(v, dtype=np.float64) for v in vb])
    num = np.einsum("ij,ij->i", a, b)
    den = np.sqrt((a * a).sum(axis=1)) * np.sqrt((b * b).sum(axis=1))
    with np.errstate(divide="ignore", invalid="ignore"):
        return pd.Series(num / den)


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


def hyperplanes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplane matrix; component (j, i)
    is md5("seed:j:i") folded to a double in [-1, 1). Engine-agnostic:
    the same doubles embed verbatim in the DuckDB oracle SQL."""
    planes = []
    for j in range(n_planes):
        row = []
        for i in range(dim):
            h = int(hashlib.md5(f"{seed}:{j}:{i}".encode()).hexdigest()[:8], 16)
            row.append(h / float(0x7FFFFFFF) - 1.0)
        planes.append(row)
    return planes


def _banded_buckets(
    df: DataFrame, id_alias: str, vec_alias: str, planes, bands: int
) -> DataFrame:
    """(id, band, bucket) rows — one per band per input row; bucket
    is the band's bit-string of hyperplane signs ('0'/'1' chars).
    The embedding payload is deliberately NOT carried through: the
    bucket join / distinct that follows shuffles only ids, and vectors
    re-join after pair dedup (a thin id->vec hash join) — at corpus
    scale the wide distinct over two 64-double arrays per candidate was
    the dominant shuffle.

    The sign matrix comes from ONE vectorized Arrow-batched pandas UDF
    doing a (batch x dim) @ (dim x planes) matmul — the pure-expression
    form (zip_with/aggregate per plane) is interpreted per element
    (~2k lambda evaluations per row) and was measured at >30s for 500
    rows once the self-join recomputed it per side. Numpy's summation
    order differs from a sequential fold only in the last ulp; a sign
    flip would need |dot| ~ 1e-12 (verified oracle-exact on the test
    corpora, and randomly-placed hyperplanes make boundary landings
    measure-zero)."""
    per_band = len(planes) // bands
    matrix = [list(row) for row in planes]

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _buckets(emb: pd.Series) -> pd.Series:
        import numpy as np

        if len(emb) == 0:
            return pd.Series([], dtype=object)
        p = np.asarray(matrix, dtype=np.float64).T  # dim x planes
        a = np.stack([np.asarray(v, dtype=np.float64) for v in emb])
        chars = np.where((a @ p) >= 0.0, "1", "0")
        return pd.Series(
            [
                ["".join(r[b * per_band : (b + 1) * per_band]) for b in range(bands)]
                for r in chars
            ]
        )

    return df.select(
        id_alias,
        F.posexplode(_buckets(F.col(vec_alias))).alias("band", "bucket"),
    )


def _cap_buckets(banded: DataFrame, max_bucket: int) -> DataFrame:
    """Drop over-full (band, bucket) groups: one degenerate bucket
    (e.g. all-zero embeddings) would otherwise go quadratic. Keeps the
    per-bucket join cost <= max_bucket^2 regardless of corpus size."""
    sizes = banded.groupBy("band", "bucket").agg(F.count(F.lit(1)).alias("_bsz"))
    return (
        banded.join(F.broadcast(sizes.where(F.col("_bsz") > max_bucket)),
                    ["band", "bucket"], "left_anti")
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    bands: int = 4,
    bits_per_band: int = 8,
    seed: int = 42,
    max_bucket: int = 10_000,
) -> DataFrame:
    """Approximate top-k: score only pairs colliding in >=1 band.

    bands * bits_per_band hyperplanes total; each band is an
    independent hash table, so recall rises with `bands` and precision
    with `bits_per_band`. The candidate join shuffles by (band,
    bucket); over-full corpus buckets are dropped (see _cap_buckets).
    """
    planes = hyperplanes(dim, bands * bits_per_band, seed)
    qv = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    )
    nv = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("nv")
    )
    q = _banded_buckets(qv, "query_id", "qv", planes, bands)
    c = _cap_buckets(
        _banded_buckets(nv, "neighbor_id", "nv", planes, bands), max_bucket
    )
    cands = (
        c.join(q, ["band", "bucket"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()  # a pair may collide in several bands; ids only here
    )
    pairs = (
        cands.join(F.broadcast(qv), "query_id")
        .join(nv, "neighbor_id")
        .select("query_id", "neighbor_id", _cos_pairs(F.col("qv"), F.col("nv")).alias("cos_raw"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_raw").desc(), F.col("neighbor_id").asc()
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cos_raw", 6).alias("cos_sim"), "rank")
    )


def _round6(v: float) -> float:
    """round-half-up to 6 dp, floor(x*1e6 + 0.5)/1e6 — the exact
    expression the DuckDB oracle uses, so centroids match bit-for-bit
    across engines (Python round()/numpy round half-to-even; DuckDB
    round() rounds half away from zero — neither matches the other)."""
    import math

    return math.floor(v * 1e6 + 0.5) / 1e6


def _ranked_cells_udf(cent_mat: list[list[float]], cell_ids: list[int]):
    """Pandas UDF: cells ordered nearest-first (cos desc, cell asc) per
    row — one Arrow-batched matmul against the centroid matrix literal
    (k rows by definition, embedded in the closure: assignment is a
    scan projection, never a shuffle or join)."""

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def _ranked_cells(emb: pd.Series) -> pd.Series:
        import numpy as np

        if len(emb) == 0:
            return pd.Series([], dtype=object)
        cm = np.asarray(cent_mat, dtype=np.float64)  # cells x dim
        cn = np.sqrt((cm * cm).sum(axis=1))
        ids = np.asarray(cell_ids, dtype=np.int64)
        a = np.stack([np.asarray(v, dtype=np.float64) for v in emb])
        cos = (a @ cm.T) / (np.sqrt((a * a).sum(axis=1))[:, None] * cn[None, :])
        return pd.Series(
            [ids[np.lexsort((ids, -row))].tolist() for row in cos]
        )

    return _ranked_cells


def kmeans_centroids(
    corpus: DataFrame,
    n_cells: int,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_mod: int = 1,
) -> tuple[list[int], list[list[float]]]:
    """Deterministic fixed-iteration Lloyd's k-means for IVF training.
    Returns (cell_ids, centroids) — cell ids are the seed vectors' ids.

    Seeds are the `n_cells` lowest-id corpus vectors; each iteration
    assigns the training sample to its nearest centroid (cos desc, cell
    asc ties) and recomputes centroids as per-dimension means, rounded
    half-up to 6 dp so an external engine replaying the same fixed
    recurrence (the DuckDB oracle unrolls it in SQL) reproduces the
    same centroids. Empty cells keep their previous centroid.

    Determinism tolerance: the 6-dp rounding absorbs the FP
    non-associativity of F.avg across partitions in every observed run,
    but it is a TOLERANCE, not a proof — a per-dimension mean landing
    within FP jitter (~1e-13 relative) of a 0.5e-6 rounding boundary
    could flip the last digit vs another engine or another partitioning
    and diverge downstream cell assignments. Recall, not equality, is
    the contract callers may rely on (tests assert recall >= 0.9); the
    oracle's exact-match check is empirical evidence on this corpus,
    not a guarantee.

    Scale: training runs on a deterministic subsample (`id % sample_mod
    == 0`) — FAISS-style IVF training on ~10^5 vectors regardless of
    corpus size; assignment cost is iters × one scan of the sample with
    per-dim avg (map-side partial agg, one k-row shuffle).
    """
    seeds = sorted(
        (int(r[0]), [_round6(float(x)) for x in r[1]])
        for r in corpus.where(F.col(id_col) < n_cells)
        .select(id_col, _as_double(F.col(vec_col)))
        .collect()
    )
    cell_ids = [c for c, _ in seeds]
    cm = [v for _, v in seeds]
    if not cm or iters <= 0:
        return cell_ids, cm
    dim = len(cm[0])
    sample = corpus
    if sample_mod > 1:
        sample = sample.where(F.col(id_col) % sample_mod == 0)
    sample = sample.select(_as_double(F.col(vec_col)).alias("nv"))
    for _ in range(iters):
        ranked = _ranked_cells_udf(cm, cell_ids)
        means = (
            sample.withColumn("cell", F.element_at(ranked(F.col("nv")), 1))
            .groupBy("cell")
            .agg(*[F.avg(F.col("nv")[i]).alias(f"c{i}") for i in range(dim)])
            .collect()
        )
        by_cell = {int(r["cell"]): r for r in means}
        cm = [
            [_round6(float(by_cell[cid][f"c{i}"])) for i in range(dim)]
            if cid in by_cell
            else cm[j]
            for j, cid in enumerate(cell_ids)
        ]
    return cell_ids, cm


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    nprobe: int = 4,
    kmeans_iters: int = 2,
    sample_mod: int = 1,
) -> DataFrame:
    """IVF approximate top-k: the corpus is partitioned into `n_cells`
    Voronoi cells around k-means centroids; a query scores only vectors
    in its `nprobe` nearest cells, so scan cost drops to
    ~nprobe/n_cells of the corpus (the inverted-file scale path next to
    LSH). Centroids come from `kmeans_centroids` — deterministic
    fixed-iteration Lloyd's seeded by the lowest-id vectors, 6-dp
    rounded so the oracle reproduces them (kmeans_iters=0 recovers the
    round-2 seeds-as-centroids behavior).

    Cell assignment is an INLINE argmax over centroid literals (the
    centroid table is k rows by definition — computed once at the
    driver, embedded in the UDF closure): the corpus is never shuffled
    or joined for assignment, each row computes its own cell in the
    scan projection.
    """
    cell_ids, cent_mat = kmeans_centroids(
        corpus, n_cells, iters=kmeans_iters, id_col=id_col, vec_col=vec_col,
        sample_mod=sample_mod,
    )
    _ranked_cells = _ranked_cells_udf(cent_mat, cell_ids)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("nv")
    )
    assigned = c.withColumn(
        "cell", F.element_at(_ranked_cells(F.col("nv")), 1)
    ).select("neighbor_id", "nv", "cell")
    return _ivf_probe(assigned, queries, cell_ids, cent_mat, k, nprobe, id_col, vec_col)


def _ivf_probe(
    assigned: DataFrame,
    queries: DataFrame,
    cell_ids: list[int],
    cent_mat: list[list[float]],
    k: int,
    nprobe: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Probe stage shared by inline and index-backed IVF: queries rank
    cells against the centroid literals, explode their nprobe nearest,
    join the (neighbor_id, nv, cell) posting list on cell, score with
    one Arrow batch, rank per query."""
    _ranked_cells = _ranked_cells_udf(cent_mat, cell_ids)
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    )
    probes = q.withColumn(
        "cell", F.explode(F.slice(_ranked_cells(F.col("qv")), 1, nprobe))
    ).select("query_id", "qv", "cell")
    pairs = (
        assigned.join(probes, "cell")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            _cos_pairs(F.col("qv"), F.col("nv")).alias("cos_raw"),
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


def ivf_index(
    spark,
    corpus: DataFrame,
    fingerprint: str,
    n_cells: int = 16,
    kmeans_iters: int = 2,
    sample_mod: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    index_name: str = "ivf",
) -> tuple[list[int], list[list[float]], DataFrame]:
    """Persisted IVF index: (centroid matrix, doc→cell posting list) as
    staged LAKE TABLES keyed by the corpus fingerprint — built once per
    corpus snapshot, reused by every subsequent `ivf_topk_staged` call,
    invalidated when the corpus or training params change (reference
    frame: FAISS index-on-disk; same lifecycle as `LakeTable.optimize`
    table maintenance).

    Two tables share one fingerprint: `<name>-centroids` (cell,
    centroid) — k rows, read back to the driver to re-embed as UDF
    literals — and `<name>-assign` (neighbor_id, cell, nv), bucketed by
    neighbor_id. The posting list stores the normalized vector so probe
    queries never rejoin the source corpus. A crash between the two
    builds self-heals: the missing table rebuilds from the same
    deterministic recurrence, so the pair can never disagree.

    Returns (cell_ids, cent_mat, assigned_df) ready for `_ivf_probe`.
    """
    from .staging import staged_table

    params_fp = f"{fingerprint}:{n_cells}:{kmeans_iters}:{sample_mod}"
    state: dict = {}

    def _build_centroids() -> DataFrame:
        cell_ids, cent_mat = kmeans_centroids(
            corpus, n_cells, iters=kmeans_iters, id_col=id_col, vec_col=vec_col,
            sample_mod=sample_mod,
        )
        state["trained"] = (cell_ids, cent_mat)
        return spark.createDataFrame(
            [(int(c), v) for c, v in zip(cell_ids, cent_mat)],
            "cell bigint, centroid array<double>",
        )

    cent_df = staged_table(
        spark, f"{index_name}-centroids", params_fp, _build_centroids,
        key_cols=["cell"], n_buckets=1,
    )
    if "trained" in state:
        cell_ids, cent_mat = state["trained"]
    else:  # cache hit: k rows back to the driver (control-plane sized)
        rows = sorted(cent_df.collect(), key=lambda r: r["cell"])
        cell_ids = [int(r["cell"]) for r in rows]
        cent_mat = [list(r["centroid"]) for r in rows]

    def _build_assign() -> DataFrame:
        ranked = _ranked_cells_udf(cent_mat, cell_ids)
        return (
            corpus.select(
                F.col(id_col).alias("neighbor_id"),
                _as_double(F.col(vec_col)).alias("nv"),
            )
            .withColumn("cell", F.element_at(ranked(F.col("nv")), 1))
            .select("neighbor_id", "nv", "cell")
        )

    assigned = staged_table(
        spark, f"{index_name}-assign", params_fp, _build_assign,
        key_cols=["neighbor_id"],
    )
    return cell_ids, cent_mat, assigned


def ivf_topk_staged(
    spark,
    corpus: DataFrame,
    queries: DataFrame,
    fingerprint: str,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    nprobe: int = 4,
    kmeans_iters: int = 2,
    sample_mod: int = 1,
) -> DataFrame:
    """`ivf_topk` against the persisted index: identical results (the
    index stores the same deterministic assignments the inline path
    computes), but training + assignment amortize across calls — only
    the nprobe-bounded probe join runs per query."""
    cell_ids, cent_mat, assigned = ivf_index(
        spark, corpus, fingerprint, n_cells=n_cells, kmeans_iters=kmeans_iters,
        sample_mod=sample_mod, id_col=id_col, vec_col=vec_col,
    )
    return _ivf_probe(assigned, queries, cell_ids, cent_mat, k, nprobe, id_col, vec_col)


def embedding_near_dup_pairs(
    corpus: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    bands: int = 4,
    bits_per_band: int = 8,
    seed: int = 7,
    max_bucket: int = 10_000,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (a < b) above threshold,
    candidate-filtered by banded LSH collision (any band), bucket-capped."""
    planes = hyperplanes(dim, bands * bits_per_band, seed)
    vecs = corpus.select(F.col(id_col).alias("doc"), _as_double(F.col(vec_col)).alias("v"))
    v = _cap_buckets(_banded_buckets(vecs, "doc", "v", planes, bands), max_bucket)
    a, b = v.alias("a"), v.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .distinct()  # ids only — vectors re-join after pair dedup
    )
    scored = (
        cands.join(vecs.select(F.col("doc").alias("doc_a"), F.col("v").alias("va")), "doc_a")
        .join(vecs.select(F.col("doc").alias("doc_b"), F.col("v").alias("vb")), "doc_b")
        .select("doc_a", "doc_b", _cos_pairs(F.col("va"), F.col("vb")).alias("cos_raw"))
    )
    return scored.where(F.col("cos_raw") >= threshold).select(
        "doc_a", "doc_b", F.round("cos_raw", 6).alias("cos_sim")
    )


def _cell_cos_udf(cent_mat: list[list[float]], cell_ids: list[int]):
    """Pandas UDF: cosine of each row's vector to its OWN assigned
    cell's centroid, rounded half-up to 6 dp (the _round6 expression,
    vectorized) — centroid matrix rides in the closure, so this is a
    scan projection like _ranked_cells_udf."""

    @F.pandas_udf(T.DoubleType())
    def _cell_cos(emb: pd.Series, cell: pd.Series) -> pd.Series:
        import numpy as np

        if len(emb) == 0:
            return pd.Series([], dtype=float)
        cm = np.asarray(cent_mat, dtype=np.float64)
        idx = {c: i for i, c in enumerate(cell_ids)}
        rows = cm[np.asarray([idx[int(c)] for c in cell])]
        a = np.stack([np.asarray(v, dtype=np.float64) for v in emb])
        cos = (a * rows).sum(axis=1) / (
            np.sqrt((a * a).sum(axis=1)) * np.sqrt((rows * rows).sum(axis=1))
        )
        return pd.Series(np.floor(cos * 1e6 + 0.5) / 1e6)

    return _cell_cos


def semdedup(
    corpus: DataFrame,
    threshold: float = 0.95,
    n_cells: int = 16,
    kmeans_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic deduplication in
    embedding space. K-means partitions the corpus into cells; within
    each cell every pair above the cosine threshold is a semantic
    duplicate, and per dup pair the member CLOSER to its centroid is
    dropped (the paper's keep-the-outlier rule: the far-from-centroid
    example carries more information), ties keeping the lower id.

    Returns one row per input vector: (vec_id, cell, cent_cos, keep)
    — survivors AND dropped rows both surface, so a curation pipeline
    routes rather than silently loses.

    Scale shape: centroids come from `kmeans_centroids` (deterministic
    6-dp Lloyd's, driver sees k rows); assignment and centroid-cosine
    are Arrow scan projections against centroid literals — no shuffle,
    no join. The pairwise stage is a self-join ON THE CELL — O(sum of
    cell_size^2) comparisons, which is the SemDeDup design point: k is
    chosen proportional to corpus size (the paper runs k=50k on LAION)
    so cells stay O(corpus/k) and the quadratic term is bounded per
    cell; callers at scale pass n_cells ~ n_vectors/128 (the driver
    query does). Pair decisions use the 6-dp half-up-rounded cosine so
    the keep verdict is engine-stable at the threshold boundary.
    """
    cell_ids, cent_mat = kmeans_centroids(
        corpus, n_cells, iters=kmeans_iters, id_col=id_col, vec_col=vec_col
    )
    ranked = _ranked_cells_udf(cent_mat, cell_ids)
    cc = (
        corpus.select(
            F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("nv")
        )
        .withColumn("cell", F.element_at(ranked(F.col("nv")), 1))
        .withColumn(
            "cent_cos", _cell_cos_udf(cent_mat, cell_ids)(F.col("nv"), F.col("cell"))
        )
        # materialized once: the assignment + centroid-cosine Arrow
        # projections are referenced by BOTH sides of the cell self-join
        # and by the final keep-join — without truncation each shuffle
        # map stage re-runs the pandas UDFs over the whole corpus (3x)
        .localCheckpoint(eager=True)
    )
    a = cc.select(
        F.col("cell"), F.col("vec_id").alias("a"),
        F.col("nv").alias("va"), F.col("cent_cos").alias("ca"),
    )
    b = cc.select(
        F.col("cell"), F.col("vec_id").alias("b"),
        F.col("nv").alias("vb"), F.col("cent_cos").alias("cb"),
    )
    cos_ab = _cos_pairs(F.col("va"), F.col("vb"))
    pairs = (
        a.join(b, "cell")
        .where(F.col("a") < F.col("b"))
        .withColumn("cos_ab", F.floor(cos_ab * 1e6 + F.lit(0.5)) / 1e6)
        .where(F.col("cos_ab") >= threshold)
    )
    dropped = pairs.select(
        F.when(F.col("ca") > F.col("cb"), F.col("a"))
        .when(F.col("cb") > F.col("ca"), F.col("b"))
        .otherwise(F.greatest("a", "b"))
        .alias("vec_id")
    ).distinct()
    return (
        cc.join(dropped.withColumn("_d", F.lit(1)), "vec_id", "left")
        .select(
            "vec_id",
            F.col("cell").cast("long").alias("cell"),
            "cent_cos",
            F.col("_d").isNull().alias("keep"),
        )
    )
