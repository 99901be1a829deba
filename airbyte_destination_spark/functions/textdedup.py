"""Near-duplicate detection for training corpora — Spark-first.

Four strategies with different recall/cost trade-offs, each expressed
as DataFrame compositions (shingle -> hash -> group/join), no Python in
the row path:

- exact:     md5 of normalized text, groupBy            (O(n) shuffle)
- minhash:   k independent min-hashes over word shingles, LSH banding,
             candidate pairs via band-bucket self-join   (sub-quadratic)
- simhash:   64-bit weighted bit-vote fingerprint; near-dups share the
             fingerprint (or a band of it)               (O(n) shuffle)
- ngram jaccard: exact Jaccard over shingle sets for candidate pairs
             (verification stage after LSH)

Hashing uses md5 substrings (hex-string min) so the DuckDB oracle can
reproduce signatures bit-for-bit — portable across engines, unlike
xxhash64/murmur3 which DuckDB lacks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, Window
from pyspark.sql import functions as F


def normalized(text_col: str = "text"):
    return F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """One row per distinct normalized text: the kept id + dup count."""
    return (
        df.groupBy(F.md5(normalized(text_col)).alias("content_hash"))
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_dups"))
    )


def _shingles(text_col: str, n: int):
    """Array of distinct word n-grams. Implemented with transform over a
    0..len-n index sequence using slice+concat (pure JVM)."""
    words = F.split(normalized(text_col), " ")
    idx = F.sequence(F.lit(1), F.size(words) - (n - 1))
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i, n)))
    return F.when(F.size(words) >= n, F.array_distinct(grams)).otherwise(
        F.array(F.concat_ws(" ", words))
    )


def _shingle_hashes(text_col: str, n: int):
    """Distinct word n-grams as rolling 64-bit keys — same gram set as
    `_shingles` but keyed by xxhash64(..xxhash64(w1,w2).., wn) instead
    of a materialized string: O(1) interpreted work per gram via
    zip_with over shifted views, and downstream joins/dedups compare
    longs. Use where the gram TEXT is never needed (contamination's
    shingle equi-join); `_shingles` stays for operators whose oracle
    hashes the gram string itself (minhash/jaccard)."""
    words = F.split(normalized(text_col), " ")
    w = words
    sz = F.size(w)
    g = w
    for k in range(1, n):
        wk = F.slice(w, k + 1, F.greatest(sz - k, F.lit(0)))
        g = F.zip_with(g, wk, lambda a, b: F.xxhash64(a, b))
    grams = F.slice(g, 1, F.greatest(sz - (n - 1), F.lit(0)))
    # short docs: one whole-text shingle, hashed through the same chain
    whole = F.aggregate(
        F.slice(w, 2, F.greatest(sz - 1, F.lit(0))),
        F.xxhash64(F.element_at(w, 1)).cast("long"),
        lambda acc, x: F.xxhash64(acc, x),
    )
    return F.when(sz >= n, F.array_distinct(grams)).otherwise(F.array(whole))


def with_minhash(
    df: DataFrame,
    text_col: str = "text",
    n_hashes: int = 8,
    shingle_n: int = 3,
    out_col: str = "minhash",
) -> DataFrame:
    """Add an array<string> MinHash signature.

    One md5 digest serves FOUR permutations: digest j of shingle s is
    md5(j || ':' || s), and permutation i = 4j+k minimizes the 8-hex-char
    slice k of digest j (hex-lexicographic min == numeric min of the
    32-bit slice — a valid uniform order). ceil(n/4) md5 calls per
    shingle instead of n; every slice is reproducible verbatim in the
    DuckDB oracle. The digests land in a real intermediate column so
    Catalyst's CollapseProject cannot inline (and recompute) the md5
    into each of the slice consumers."""
    sh = _shingles(text_col, shingle_n)
    n_digests = (n_hashes + 3) // 4
    digests = F.transform(
        sh,
        lambda s: F.concat(
            *[F.md5(F.concat(F.lit(f"{j}:"), s)) for j in range(n_digests)]
        ),
    )
    tmp = "_mh_digests"
    out = df.withColumn(tmp, digests)

    def perm(i):
        return F.array_min(
            F.transform(F.col(tmp), lambda h: F.substring(h, i * 8 + 1, 8))
        )

    sig = F.array(*[perm(i) for i in range(n_hashes)])
    return out.withColumn(out_col, sig).drop(tmp)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
    max_bucket: int = 10_000,
) -> DataFrame:
    """Candidate near-duplicate pairs via LSH banding.

    Signature is split into `bands` bands of n_hashes/bands rows; docs
    sharing any full band land in the same bucket; the bucket self-join
    yields pairs (a < b). The join key is (band_idx, band_hash) so the
    shuffle is by bucket — sub-quadratic, scales with corpus size.
    Buckets larger than `max_bucket` are dropped before the self-join:
    one degenerate bucket (e.g. every empty doc shares a shingle) is an
    O(b^2) explosion; capping bounds any bucket's join cost. Dropped
    docs still pair through their other, non-degenerate bands.
    """
    rows_per_band = n_hashes // bands
    sigd = with_minhash(df, text_col, n_hashes, shingle_n).select(
        F.col(id_col).alias("doc"), "minhash"
    )
    banded = sigd.select(
        "doc",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.md5(
                            F.concat_ws(
                                "|",
                                *[
                                    F.element_at("minhash", b * rows_per_band + r + 1)
                                    for r in range(rows_per_band)
                                ],
                            )
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc", "bb.band", "bb.bucket")
    over_full = (
        banded.groupBy("band", "bucket")
        .agg(F.count(F.lit(1)).alias("_bsz"))
        .where(F.col("_bsz") > max_bucket)
    )
    banded = banded.join(F.broadcast(over_full), ["band", "bucket"], "left_anti")
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.doc") < F.col("r.doc")),
        )
        .select(F.col("l.doc").alias("doc_a"), F.col("r.doc").alias("doc_b"))
        .distinct()
    )


def with_simhash(
    df: DataFrame,
    text_col: str = "text",
    bits: int = 64,
    shingle_n: int = 2,
    out_col: str = "simhash",
) -> DataFrame:
    """64-bit SimHash fingerprint as a bigint.

    Bit j of the fingerprint is the majority vote over shingles of bit
    j of each shingle's hash. Shingle hash bits are the first 64 bits
    of md5(shingle) (hex -> base-2 via conv, still pure JVM) so the
    DuckDB oracle reproduces the fingerprint bit-for-bit; near-identical
    docs agree on most votes and thus share fingerprints at small edit
    distance.
    """
    sh = _shingles(text_col, shingle_n)
    # ONE pass over the shingles: each shingle's 64-bit hash becomes a
    # zero-padded binary string; votes accumulate per bit position via
    # zip_with. (The naive form — one aggregate per bit — re-walks the
    # shingle array 64 times and measured 26s vs <2s on sf0.01.)
    hbits = F.transform(
        sh,
        lambda s: F.split(
            F.lpad(F.conv(F.substring(F.md5(s), 1, 16), 16, 2), bits, "0"), ""
        ),
    )
    votes = F.aggregate(
        hbits,
        F.array_repeat(F.lit(0), bits),
        lambda acc, cs: F.zip_with(
            acc, cs, lambda a, c: a + F.when(c == "1", F.lit(1)).otherwise(F.lit(-1))
        ),
    )
    df = df.withColumn("_votes", votes)
    fp = None
    for j in range(bits):
        # char position j+1 holds bit (bits-1-j); the mapping just has
        # to be consistent, hamming distances are preserved either way
        bit = F.when(F.element_at("_votes", j + 1) > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        term = F.shiftleft(bit, bits - 1 - j)
        fp = term if fp is None else fp.bitwiseOR(term)
    return df.withColumn(out_col, fp).drop("_votes")


def ngram_jaccard_pairs(
    df: DataFrame,
    candidate_pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact n-gram Jaccard verification of candidate pairs.

    Joins shingle sets back onto (doc_a, doc_b) and computes
    |intersection| / |union| with array functions — the verify stage
    after LSH recall."""
    sh = df.select(
        F.col(id_col).alias("doc"), _shingles(text_col, shingle_n).alias("sh")
    )
    j = (
        candidate_pairs.join(sh.withColumnRenamed("doc", "doc_a").withColumnRenamed("sh", "sh_a"), "doc_a")
        .join(sh.withColumnRenamed("doc", "doc_b").withColumnRenamed("sh", "sh_b"), "doc_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (
        j.select(
            "doc_a",
            "doc_b",
            F.round(inter / union, 6).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def contamination(
    df: DataFrame,
    probes: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 5,
) -> DataFrame:
    """Benchmark-contamination check: which corpus documents share a
    word n-gram with any probe document (the eval-set leakage scan a
    training pipeline runs before a data release).

    The probe set is small by definition (an eval benchmark), so its
    exploded distinct shingles BROADCAST to every executor and the
    corpus side joins without shuffling its text — the corpus is
    scanned once, shuffled only by the final per-doc count (post-join
    rows only). Returns (doc_id, n_shared) for contaminated documents,
    probes excluded from the corpus side.
    """
    # shingles join as rolling 64-bit keys (_shingle_hashes), not gram
    # strings: the join only tests equality, so longs shrink both the
    # broadcast table and the corpus-side explode (~2x at sf0.1); the
    # string-shingle DuckDB oracle independently verifies the counts
    probe_sh = (
        probes.select(F.explode(_shingle_hashes(text_col, shingle_n)).alias("shingle"))
        .distinct()
    )
    probe_ids = probes.select(F.col(id_col).alias("_pid"))
    corpus_sh = (
        df.join(F.broadcast(probe_ids), F.col(id_col) == F.col("_pid"), "left_anti")
        .select(
            F.col(id_col),
            F.explode(_shingle_hashes(text_col, shingle_n)).alias("shingle"),
        )
    )
    return (
        corpus_sh.join(F.broadcast(probe_sh), "shingle")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )


def connected_components(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iters: int = 20,
) -> DataFrame:
    """Connected components over an undirected pair graph by min-label
    propagation: every node's cluster id converges to the SMALLEST id
    reachable from it (the canonical representative a near-dup dedup
    keeps). Returns (node, cluster).

    Scale shape: each iteration is one broadcast-free join of the edge
    list against current labels plus one min-aggregate — O(E) shuffled
    per iteration, O(diameter) iterations. Near-duplicate graphs are
    overwhelmingly tiny cliques (diameter 1-2), so this converges in
    2-3 rounds at any corpus size; `max_iters` bounds pathological
    chains. The driver loop only ever sees a one-row convergence count
    (control plane), never data. Deterministic: pure min-lattice
    fixpoint, independent of partitioning or iteration interleaving.
    """
    fwd = pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
    edges = (
        fwd.unionByName(
            fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
        .cache()
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("cluster", F.col("node"))
        .cache()
    )
    labels.count()
    for _ in range(max_iters):
        via_neighbors = (
            edges.join(labels, edges["dst"] == labels["node"])
            .select(edges["src"].alias("node"), F.col("cluster"))
        )
        # localCheckpoint (not cache): labels is referenced twice per
        # round (join + convergence check), so lineage doubles per
        # iteration — without truncation the logical plan grows 2^iters
        # and OOMs the driver on deep graphs long before data does.
        new_labels = (
            labels.unionByName(via_neighbors)
            .groupBy("node")
            .agg(F.min("cluster").alias("cluster"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.join(labels.withColumnRenamed("cluster", "old"), "node")
            .where(F.col("cluster") != F.col("old"))
            .limit(1)
            .count()
        )
        if labels.is_cached:
            labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    edges.unpersist()
    return labels


def connected_components_star(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iters: int = 30,
    _stats: dict | None = None,
) -> DataFrame:
    """Connected components by the alternating LARGE-STAR / SMALL-STAR
    algorithm (Kiveris et al., "Connected Components in MapReduce and
    Beyond", SoCC'14 — public paper, re-derived here in DataFrame ops).
    Same output contract as `connected_components`: (node, cluster)
    with cluster = smallest reachable id.

    Why a second algorithm: min-label propagation needs O(diameter)
    rounds — fine for near-dup graphs (tiny cliques) but pathological
    on deep chains (a 10^4-long similarity chain = 10^4 shuffles).
    Star contraction HALVES long paths every alternation (large-star
    hangs every node off its neighborhood min, small-star flattens),
    converging in O(log^2 n) rounds on ANY topology, so a 100 TB
    corpus with an adversarial dup chain still finishes in ~dozens of
    rounds, not millions.

    Per round: two WINDOW-min passes over the edge list (each star's
    per-center min rides one `u`-partitioned window, so the aggregate
    and the re-hang share a single exchange — the groupBy+join form
    paid an extra exchange and a sort-merge join per star) plus the
    round-output dedup — O(E) shuffled per round, ~2x the per-round
    cost of min-label, which is why `near_dup_clusters` defaults to
    min-label and exposes this as `cc_algorithm="star"`. Convergence
    is detected by an edge-set checksum (count + xxhash sum) OBSERVED
    on the round's materialization job itself (`Observation` metrics
    collected by the eager localCheckpoint), so a round costs exactly
    one Spark job. Deterministic min-lattice fixpoint,
    partitioning-independent.
    """
    fwd = pairs.select(
        F.col(a_col).cast("long").alias("u"), F.col(b_col).cast("long").alias("v")
    ).where(F.col("u") != F.col("v"))
    # canonical undirected edge set, deduped
    edges = (
        fwd.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        .distinct()
        .cache()
    )
    all_nodes = (
        edges.select(F.col("u").alias("node"))
        .unionByName(edges.select(F.col("v").alias("node")))
        .distinct()
        .cache()
    )
    all_nodes.count()

    def _checksum(e: DataFrame) -> tuple:
        r = e.agg(
            F.count(F.lit(1)).alias("n"),
            # decimal(38,0) sum: overflow-proof under ANSI mode for any
            # realistic edge count (long sum trips ARITHMETIC_OVERFLOW)
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h"),
        ).collect()[0]
        return (r["n"], r["h"])

    def _large_star(e: DataFrame) -> DataFrame:
        # both directions; for each center u: m = min(neighbors ∪ {u});
        # re-hang every STRICTLY LARGER neighbor off m. The per-center
        # min is a WINDOW over the same u-partitioning the re-hang
        # reads — one exchange, no join (the groupBy+join form paid a
        # second exchange plus a sort-merge join per round).
        adj = e.select("u", "v").unionByName(
            e.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        w = Window.partitionBy("u")
        # no distinct here: the caller re-canonicalizes and dedups the
        # round output once — deduping twice is a wasted shuffle/round
        return (
            adj.withColumn("m", F.least(F.min("v").over(w), F.col("u")))
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .where(F.col("u") != F.col("v"))
        )

    def _small_star(e: DataFrame) -> DataFrame:
        # neighbors ≤ center only (e is canonical u>v, so window by u);
        # m = min(smaller-neighbors ∪ {u}); hang them all (and u) off m
        # — same single-exchange window shape as _large_star
        w = Window.partitionBy("u")
        nbrs = e.withColumn("m", F.min("v").over(w))
        re_hung = nbrs.select(F.col("v").alias("u"), F.col("m").alias("v"))
        center = nbrs.select("u", F.col("m").alias("v"))
        # single dedup for the whole round output (center dups included)
        return (
            re_hung.unionByName(center)
            .where(F.col("u") != F.col("v"))
            .distinct()
        )

    prev = _checksum(edges)
    iters = 0
    for _ in range(max_iters):
        iters += 1
        ls = _large_star(edges)
        # re-canonicalize (large-star emits v=component-min < u already,
        # but duplicates across directions need the u>v form). NO
        # distinct here (round 6): small_star's min-aggregate is
        # duplicate-insensitive and the round output is deduped once at
        # its end, so a mid-round dedup was a full extra exchange per
        # round buying nothing — the dup factor into small_star is
        # bounded by 2 (each undirected edge appears at most twice).
        canon = ls.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        # localCheckpoint (not cache): each round references `edges`
        # 6-8x, so without lineage TRUNCATION the logical plan grows
        # exponentially (measured: 2 GB plan string by round ~10).
        # Eager local checkpoint = materialize round output + cut the
        # plan; on a real cluster with lossy executors swap for
        # reliable checkpoint(dir). (Round-6 note: a LAZY checkpoint
        # materialized by the checksum job was tried to save one job
        # per round and MEASURED SLOWER — 6.4s -> 10.3s for
        # graph_components_star — because downstream references
        # recompute the un-materialized subtree; keep eager.) The
        # convergence checksum rides the SAME materialization job as
        # observed metrics — one Spark job per round, not two.
        obs = Observation()
        nxt = _small_star(canon).observe(
            obs,
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h"),
        ).localCheckpoint(eager=True)
        mets = obs.get
        cur = (mets["n"], mets["h"])
        if edges.is_cached:
            edges.unpersist()
        edges = nxt
        if cur == prev:
            break
        prev = cur
    if _stats is not None:
        _stats["iters"] = iters
    # fixpoint: every edge is (node, root). Roots + isolated inputs map
    # to themselves; matches connected_components' output contract.
    labels = edges.select(F.col("u").alias("node"), F.col("v").alias("cluster"))
    roots = all_nodes.join(
        edges.select(F.col("u").alias("node")).distinct(), "node", "left_anti"
    ).select("node", F.col("node").alias("cluster"))
    out = labels.unionByName(roots)
    return out


def near_dup_clusters(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
    threshold: float = 0.8,
    max_bucket: int = 10_000,
    cc_algorithm: str = "label",
) -> DataFrame:
    """End-to-end near-duplicate clustering: MinHash-LSH candidates ->
    exact n-gram Jaccard verification -> connected components. Returns
    (doc_id, cluster_id) for every document in at least one verified
    near-dup pair; cluster_id is the smallest doc id in the cluster
    (the canonical survivor of keep-one dedup). Fully deterministic,
    so the DuckDB oracle replays it with a recursive min-reachability
    CTE over the same verified pairs.

    `cc_algorithm`: "label" (min-label propagation, O(diameter) rounds
    — the default; near-dup graphs are shallow cliques) or "star"
    (large-star/small-star, O(log^2 n) rounds — for corpora where dup
    chains run deep). Both produce identical labels (pytest-pinned).
    """
    cands = minhash_lsh_pairs(
        df, id_col=id_col, text_col=text_col, n_hashes=n_hashes, bands=bands,
        shingle_n=shingle_n, max_bucket=max_bucket,
    )
    verified = ngram_jaccard_pairs(
        df, cands, id_col=id_col, text_col=text_col, shingle_n=shingle_n,
        threshold=threshold,
    )
    cc = connected_components_star if cc_algorithm == "star" else connected_components
    return cc(verified).select(
        F.col("node").alias(id_col), F.col("cluster").alias("cluster_id")
    )


def fuzzy_dedup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    neighbors: int = 4,
    max_dist: int = 10,
    block_len: int = 12,
    key_cap: int = 128,
) -> DataFrame:
    """Edit-distance near-duplicate pairs via multi-pass sorted
    neighborhood (Hernandez & Stolfo, SIGMOD'95) — the entity-resolution
    complement to MinHash: catches small in-place edits (typo-level
    divergence) that shingle-set Jaccard scores as highly similar but
    whose *candidate generation* here costs one sort instead of k hash
    tables.

    Plan shape (the part that must survive 100 TB):
    - sort key = first `key_cap` chars of the normalized text; capping
      bounds every Levenshtein evaluation at O(key_cap^2) regardless of
      document length (full-text edit distance on web documents is the
      quadratic trap).
    - TWO blocking passes — prefix and reversed-prefix of the key — so
      an edit near the front of a document (which scatters prefix sort
      order) is still caught by the suffix pass. Each pass windows
      PARTITIONED BY the block, never a global window: the plan is one
      hash shuffle per pass, no SinglePartition exchange, and each doc
      compares against <= `neighbors` sort-adjacent docs per pass
      (O(n * neighbors) Levenshtein calls corpus-wide).
    - verification (levenshtein <= max_dist) runs inside the window
      projection — candidates that fail never reach the shuffle that
      dedups pairs across passes.

    Returns (doc_a, doc_b, dist), doc_a < doc_b, distinct across
    passes. Deterministic (sort ties broken by id), so the DuckDB
    oracle replays it with the same windows + levenshtein().
    """
    from pyspark.sql import Window

    key = F.substring(normalized(text_col), 1, key_cap)
    base = df.select(F.col(id_col).alias("_id"), key.alias("_k"))
    passes = [
        F.substring(F.col("_k"), 1, block_len),
        F.substring(F.reverse(F.col("_k")), 1, block_len),
    ]
    out = None
    for blk in passes:
        w = Window.partitionBy("_blk").orderBy("_k", "_id")
        cur = base.withColumn("_blk", blk)
        # ALL lead offsets in one window projection: a per-offset union
        # would re-shuffle + re-sort the pass input `neighbors` times;
        # this shape is one Window operator (one exchange, one sort)
        # whose frame walks forward once. The leads are computed in
        # their own select — Spark rejects window expressions inside a
        # generator — and the next projection explodes them.
        leads = cur.select(
            F.col("_id").alias("a"),
            F.col("_k").alias("ak"),
            *[
                c
                for k in range(1, neighbors + 1)
                for c in (
                    F.lead("_id", k).over(w).alias(f"_b{k}"),
                    F.lead("_k", k).over(w).alias(f"_bk{k}"),
                )
            ],
        )
        nbrs = F.array(*[
            F.struct(
                F.col(f"_b{k}").alias("b"), F.col(f"_bk{k}").alias("bk")
            )
            for k in range(1, neighbors + 1)
        ])
        cand = (
            leads.select("a", "ak", F.explode(nbrs).alias("nb"))
            .select(
                "a",
                F.col("nb.b").alias("b"),
                F.levenshtein(F.col("ak"), F.col("nb.bk")).alias("dist"),
            )
            .where(F.col("b").isNotNull() & (F.col("dist") <= max_dist))
        )
        out = cand if out is None else out.unionByName(cand)
    return (
        out.select(
            F.least("a", "b").alias("doc_a"),
            F.greatest("a", "b").alias("doc_b"),
            F.col("dist"),
        )
        # the same pair can surface in both passes (and at several lead
        # offsets with equal dist); keep the minimum distance
        .groupBy("doc_a", "doc_b")
        .agg(F.min("dist").alias("dist"))
    )


def token_block_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    block_tokens: int = 16,
) -> DataFrame:
    """Corpus-wide exact-substring dedup over PRE-TOKENIZED sequences
    (Lee et al. ACL'22, "Deduplicating Training Data Makes Language
    Models Better" — their ExactSubstr rule, suffix-array byte spans
    coarsened to consecutive `block_tokens`-token blocks, the same
    convention as block_dedup/dedup_spans): the FIRST corpus occurrence
    of every distinct token block is kept, every later copy — in OTHER
    documents or later in the same one — is dropped, and each document
    is rebuilt from its surviving blocks in original order. This is the
    cross-document remediation the text-space pair (`block_dedup`
    detection, `dedup_spans` intra-doc removal) stops short of, in the
    token space the input_hint payload actually ships.

    First occurrence = minimum (id, pos) over the block's instances —
    deterministic at any parallelism, and the DuckDB twin replays it
    with a row_number window. Blocks are keyed md5 over the
    comma-joined token ids, reproducible across engines.

    Returns (id_col, tokens_dedup array<int>, n_tok_dedup, n_blocks,
    n_dropped). Empty input sequences surface with an empty array,
    never vanish (posexplode_outer).

    Scale shape: the block stream shuffles twice (once hash-keyed for
    the ownership join, once doc-keyed for the rebuild) — both
    O(corpus), unavoidable for a global rule. Ownership itself is a
    map-side-combined min-struct aggregate, so a pathological block
    repeated 10^9 times contributes one row per map partition to the
    exchange, and the verdict join against the one-row-per-hash owner
    side is AQE-skew-splittable. No window over the raw block stream
    (a row_number per block hash would serialize the hot block's
    instances through one task).
    """
    toks = F.col(tokens_col)
    nblk = F.ceil(F.size(toks) / F.lit(block_tokens)).cast("int")
    blocks = df.select(
        F.col(id_col),
        F.posexplode_outer(
            F.when(
                F.size(toks) > 0,
                F.transform(
                    F.sequence(F.lit(0), nblk - 1),
                    lambda i: F.slice(toks, i * block_tokens + 1, block_tokens),
                ),
            )
        ).alias("pos", "blk"),
    ).withColumn(
        "bh",
        F.md5(F.array_join(F.transform("blk", lambda x: x.cast("string")), ",")),
    )
    owners = blocks.where(F.col("pos").isNotNull()).groupBy("bh").agg(
        F.min(F.struct(F.col(id_col).alias("i"), F.col("pos").alias("p"))).alias(
            "own"
        )
    )
    verdict = blocks.join(owners.hint("shuffle_hash"), "bh", "left").withColumn(
        "_keep",
        (F.col(id_col) == F.col("own.i")) & (F.col("pos") == F.col("own.p")),
    )
    kept = F.when(F.col("_keep"), F.struct(F.col("pos"), F.col("blk")))
    return verdict.groupBy(id_col).agg(
        F.coalesce(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(kept)), lambda s: s["blk"]
                )
            ),
            F.array().cast("array<int>"),
        ).alias("tokens_dedup"),
        F.coalesce(
            F.sum(
                F.when(F.col("_keep"), F.size("blk")).otherwise(F.lit(0))
            ),
            F.lit(0),
        ).cast("int").alias("n_tok_dedup"),
        F.count(F.col("pos")).cast("int").alias("n_blocks"),
        F.coalesce(F.sum((~F.col("_keep")).cast("int")), F.lit(0))
        .cast("int")
        .alias("n_dropped"),
    )
