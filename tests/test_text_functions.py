"""Text analysis, near-dup detection, similarity, multimodal plumbing."""

from pyspark.sql import functions as F

from airbyte_destination_spark.functions.multimodal import (
    extract_features,
    sample_frames,
    synthetic_media,
)
from airbyte_destination_spark.functions.similarity import (
    cosine_topk,
    embedding_near_dup_pairs,
    lsh_topk,
)
from airbyte_destination_spark.functions.text import (
    fingerprint,
    lang_id,
    quality_features,
    token_counts,
)
from airbyte_destination_spark.functions.textdedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    with_minhash,
    with_simhash,
)

DOCS = [
    (1, "the cat sat of the mat and it is a test for the run"),
    (2, "der hund ist nicht auf der matte und das ist ein test"),
    (3, "le chat est dans la maison pour le test et la suite"),
    (4, "xyzzy plugh qwfp zxcv"),  # no stopwords -> und
    (5, "the cat sat of the mat and it is a test for the run"),  # dup of 1
    (6, "the cat sat of the mat and it is a test for the walk"),  # near-dup of 1
]


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_lang_id(spark):
    out = {r.doc_id: r.lang_pred for r in lang_id(_docs(spark)).collect()}
    assert out[1] == "en" and out[2] == "de" and out[3] == "fr" and out[4] == "und"


def test_quality_and_tokens(spark):
    q = quality_features(_docs(spark)).where("doc_id = 1").first()
    assert q.n_words == 14
    assert 0 < q.stopword_ratio < 1
    t = token_counts(_docs(spark)).where("doc_id = 1").first()
    assert t.n_ws_tokens == 14
    assert t.n_distinct_tokens < 14  # 'the' repeats


def test_fingerprint_exact_dedup(spark):
    fp = fingerprint(_docs(spark))
    vals = {r.doc_id: r.fingerprint for r in fp.collect()}
    assert vals[1] == vals[5] != vals[6]
    d = exact_dedup(_docs(spark))
    row = d.where("n_dups = 2").first()
    assert row.keep_id == 1


def test_minhash_lsh_finds_near_dups(spark):
    pairs = {
        (r.doc_a, r.doc_b)
        for r in minhash_lsh_pairs(_docs(spark), n_hashes=8, bands=4).collect()
    }
    assert (1, 5) in pairs  # exact dup always collides
    # near-dup 1-6 shares most shingles -> should collide in >=1 band
    assert (1, 6) in pairs
    # unrelated docs must not pair
    assert (2, 3) not in pairs and (1, 4) not in pairs


def test_minhash_identical_signatures(spark):
    sig = {r.doc_id: r.minhash for r in with_minhash(_docs(spark)).collect()}
    assert sig[1] == sig[5] != sig[4]


def test_simhash_near_dup_distance(spark):
    fp = {r.doc_id: r.simhash for r in with_simhash(_docs(spark)).collect()}
    assert fp[1] == fp[5]
    ham_near = bin(fp[1] ^ fp[6]).count("1")
    ham_far = bin(fp[1] ^ fp[4]).count("1")
    assert ham_near < ham_far


def test_ngram_jaccard_verification(spark):
    docs = _docs(spark)
    cands = minhash_lsh_pairs(docs, n_hashes=8, bands=4)
    verified = ngram_jaccard_pairs(docs, cands, threshold=0.5)
    got = {(r.doc_a, r.doc_b): r.jaccard for r in verified.collect()}
    assert got[(1, 5)] == 1.0
    assert (1, 6) in got and 0.5 <= got[(1, 6)] < 1.0


def test_cosine_topk_and_lsh(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.where("vec_id < 5")
    exact = cosine_topk(emb, q, k=5)
    assert exact.groupBy("query_id").count().where("count != 5").count() == 0
    # lsh recall: its top hit should appear in exact top-20 frequently;
    # at minimum the api returns valid ranks and no self matches
    approx = lsh_topk(emb, q, k=5, dim=64, bands=8, bits_per_band=4)
    assert approx.where("query_id = neighbor_id").count() == 0
    ranks = [r.rank for r in approx.where("query_id = 0").collect()]
    assert ranks == sorted(ranks)


def test_embedding_near_dup_pairs_runs(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    out = embedding_near_dup_pairs(emb, threshold=0.4, bands=8, bits_per_band=4)
    rows = out.collect()
    assert all(r.doc_a < r.doc_b for r in rows)


def test_multimodal_plumbing(spark):
    media = synthetic_media(spark, 50, seed=1)
    assert media.schema["content"].dataType.typeName() == "binary"
    feats = extract_features(media, fake=True)
    rows = feats.collect()
    assert len(rows) == 50
    assert all(len(r.feature) == 8 for r in rows)
    assert all(r.checksum and r.width >= 16 for r in rows)
    # determinism: same input -> same features
    again = extract_features(synthetic_media(spark, 50, seed=1), fake=True)
    assert sorted((r.media_id, r.checksum) for r in rows) == sorted(
        (r.media_id, r.checksum) for r in again.collect()
    )
    frames = sample_frames(media)
    assert frames.where("frame_idx < 0").count() == 0


def test_multimodal_codec_formats_are_declared_boundary(spark):
    """fake=False is REAL for PPM/WAV (round 5); payloads in any other
    format (synthetic_media's sha256-text bytes stand in for
    JPEG/MP3/...) still raise the declared NotImplementedError — now at
    execution, per payload, from inside the Arrow batch."""
    import pytest

    with pytest.raises(Exception, match="PPM|fake=True|NotImplemented"):
        extract_features(synthetic_media(spark, 1), fake=False).collect()


def test_rolling_fingerprint_order_sensitive(spark):
    from airbyte_destination_spark.functions.text import rolling_fingerprint

    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "gamma beta alpha"), (3, "alpha beta gamma")],
        "doc_id long, text string",
    )
    vals = {r.doc_id: r.rhash for r in rolling_fingerprint(df).collect()}
    assert vals[1] == vals[3]          # identical text -> identical hash
    assert vals[1] != vals[2]          # same words, different order -> differs
    assert all(0 <= v < 2_147_483_647 for v in vals.values())


def test_ivf_topk_probes_subset(spark):
    from airbyte_destination_spark.functions.similarity import cosine_topk, ivf_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.where("vec_id < 5")
    approx = ivf_topk(emb, q, k=5, n_cells=16, nprobe=4)
    rows = approx.collect()
    assert all(r.query_id != r.neighbor_id for r in rows)
    # probing ALL cells must reproduce the exact top-k
    full = ivf_topk(emb, q, k=5, n_cells=16, nprobe=16)
    exact = cosine_topk(emb, q, k=5)
    got = {(r.query_id, r.rank): r.neighbor_id for r in full.collect()}
    want = {(r.query_id, r.rank): r.neighbor_id for r in exact.collect()}
    assert got == want


def test_multimodal_arbitrary_binary_bytes(spark):
    """True non-UTF8 bytes (all 256 values, embedded NULs) must survive
    the Arrow binary path into the decode stub unchanged."""
    import hashlib

    payloads = [bytes(range(256)), b"\x00" * 64, b"\xff\xfe" * 100]
    rows = [(f"b-{i}", "image", p, {"source": "raw"}) for i, p in enumerate(payloads)]
    from airbyte_destination_spark.functions.multimodal import MEDIA_SCHEMA, extract_features

    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r.media_id: r for r in extract_features(df, fake=True).collect()}
    for i, p in enumerate(payloads):
        r = got[f"b-{i}"]
        assert r.n_bytes == len(p)
        assert r.checksum == hashlib.sha256(p).hexdigest()[:16]


def test_contamination_broadcasts_probes(spark):
    from airbyte_destination_spark.functions.textdedup import contamination
    from pyspark.sql import functions as F

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    probes = docs.where(F.col("doc_id") < 10)
    out = contamination(docs, probes, shingle_n=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # probe shingles must broadcast; the corpus text never shuffles
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    rows = out.collect()
    assert all(r.doc_id >= 10 and r.n_shared >= 1 for r in rows)


def test_ivf_kmeans_recall_on_clustered_corpus(spark):
    """Deterministic Lloyd's centroids must track a clustered corpus:
    with 8 true clusters and nprobe=2, IVF top-5 must recover most of
    the exact top-5 (the first-n seed centroids of round 2 were the
    disclosed recall gap this k-means closes)."""
    import numpy as np

    from airbyte_destination_spark.functions.similarity import (
        cosine_topk,
        ivf_topk,
        kmeans_centroids,
    )

    rng = np.random.default_rng(11)
    centers = rng.normal(size=(8, 64))
    rows = []
    for i in range(400):
        c = i % 8
        v = centers[c] + 0.05 * rng.normal(size=64)
        rows.append((i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = emb.where("vec_id < 16")

    approx = ivf_topk(emb, q, k=5, n_cells=8, nprobe=2, kmeans_iters=3)
    exact = cosine_topk(emb, q, k=5)
    got = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    want = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    recall = len(got & want) / len(want)
    assert recall >= 0.9, f"IVF k-means recall {recall:.2f} < 0.9"

    # the trained centroids must separate the true clusters: every true
    # cluster should own at least one centroid's nearest association
    _, cm = kmeans_centroids(emb, n_cells=8, iters=3)
    cmat = np.asarray(cm)
    owners = set()
    for cc in centers:
        cos = (cmat @ cc) / (np.linalg.norm(cmat, axis=1) * np.linalg.norm(cc))
        owners.add(int(np.argmax(cos)))
    assert len(owners) >= 6, f"centroids collapsed: {len(owners)} distinct owners"

    # determinism: retraining reproduces identical centroids
    _, cm2 = kmeans_centroids(emb, n_cells=8, iters=3)
    assert cm == cm2


def test_connected_components_transitive_chain(spark):
    """a~b and b~c (but no a~c edge) must land in ONE cluster labeled by
    the smallest member; disjoint pairs stay separate; convergence is
    reached via propagation, not direct edges."""
    from airbyte_destination_spark.functions.textdedup import connected_components

    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (10, 11), (20, 21), (21, 20)],
        "doc_a long, doc_b long",
    )
    got = {r.node: r.cluster for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20}


def test_near_dup_clusters_end_to_end(spark):
    """Identical and near-identical docs cluster under the smallest id;
    unique docs are absent from the output."""
    from airbyte_destination_spark.functions.textdedup import near_dup_clusters

    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [
        (1, base),
        (5, base),                      # exact dup of 1
        (3, base + " extra"),           # near dup of 1/5
        (7, "completely different text about spark scaling and shuffles here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.cluster_id for r in near_dup_clusters(docs, threshold=0.5).collect()}
    assert got[1] == 1 and got[5] == 1 and got[3] == 1
    assert 7 not in got


def test_pii_scan_counts_and_redaction(spark):
    from airbyte_destination_spark.functions.text import pii_scan

    rows = [
        (1, "mail me at a.b+c@example.org or root@10.0.0.1 cluster at 192.168.0.12"),
        (2, "call +1 415 555 0100 or 020-7946-0958 now"),
        (3, "clean text, no identifiers at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in pii_scan(df).collect()}
    assert got[1].n_emails == 1 and got[1].n_ipv4 >= 1
    assert got[2].n_phones == 2
    assert got[3].n_emails == got[3].n_ipv4 == got[3].n_phones == 0
    # redaction changes the hash only when something was redacted
    import hashlib
    assert got[3].redacted_md5 == hashlib.md5(rows[2][1].encode()).hexdigest()
    assert got[1].redacted_md5 != hashlib.md5(rows[0][1].encode()).hexdigest()


def test_lsh_topk_recall_on_clustered_corpus(spark):
    """Banded hyperplane LSH must recover most exact top-5 neighbors on
    a clustered corpus — the recall twin of the IVF k-means test."""
    import numpy as np

    from airbyte_destination_spark.functions.similarity import cosine_topk, lsh_topk

    rng = np.random.default_rng(23)
    centers = rng.normal(size=(8, 64))
    rows = [
        (i, [float(x) for x in centers[i % 8] + 0.05 * rng.normal(size=64)])
        for i in range(400)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = emb.where("vec_id < 16")
    approx = lsh_topk(emb, q, k=5, dim=64, bands=8, bits_per_band=6, seed=7)
    exact = cosine_topk(emb, q, k=5)
    got = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    want = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    recall = len(got & want) / len(want)
    assert recall >= 0.85, f"LSH recall {recall:.2f} < 0.85"


import pytest as _pytest


@_pytest.mark.parametrize("shingle_n", [3, 5])
def test_near_dup_clusters_shingle_n_plumbed(spark, shingle_n):
    """Candidate and verify stages must use the SAME shingle size
    (regression: shingle_n was silently not forwarded to the LSH
    stage). Expected clusters are recomputed here with a plain-Python
    all-pairs word-n-gram Jaccard + union-find oracle at the requested
    n — at n=3 doc 3 joins the cluster (J≈0.54), at n=5 it does not
    (J≈0.23), so the two parameterizations pin different outputs."""
    import itertools
    import re as _re

    from airbyte_destination_spark.functions.textdedup import near_dup_clusters

    base = ("alpha bravo charlie delta echo foxtrot golf hotel india "
            "juliet kilo lima")
    rows = [
        (1, base),
        (2, base + " mike november"),
        (3, base.replace("echo", "别echo")),
        (4, "totally different words one two three four five six seven"),
        (5, base),
    ]

    def grams(text, n):
        ws = _re.sub(r"\s+", " ", text.strip()).lower().split(" ")
        if len(ws) < n:
            return {" ".join(ws)}
        return {" ".join(ws[i:i + n]) for i in range(len(ws) - n + 1)}

    thr = 0.5
    parent = {i: i for i, _ in rows}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    members = set()
    for (ia, ta), (ib, tb) in itertools.combinations(rows, 2):
        ga, gb = grams(ta, shingle_n), grams(tb, shingle_n)
        if len(ga & gb) / len(ga | gb) >= thr:
            members |= {ia, ib}
            ra, rb = find(ia), find(ib)
            parent[max(ra, rb)] = min(ra, rb)
    expected = {i: find(i) for i in members}

    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r.cluster_id
        for r in near_dup_clusters(
            docs, shingle_n=shingle_n, threshold=thr, n_hashes=16, bands=8
        ).collect()
    }
    assert got == expected, (shingle_n, got, expected)


def test_tokenize_freq_vocab_ranks_and_order(spark):
    from airbyte_destination_spark.functions.text import tokenize_freq_vocab

    docs = spark.createDataFrame(
        [(1, "b a a"), (2, "a b c")], "doc_id bigint, text string"
    )
    out = {r.doc_id: (r.tokens, r.n_tok) for r in tokenize_freq_vocab(docs).collect()}
    # freq rank: a(3)=1, b(2)=2, c(1)=3; token order follows word order
    assert out == {1: ([2, 1, 1], 3), 2: ([1, 2, 3], 3)}
    capped = {
        r.doc_id: r.tokens
        for r in tokenize_freq_vocab(docs, vocab_size=2).collect()
    }
    assert capped == {1: [2, 1, 1], 2: [1, 2, 0]}  # c -> oov 0


def test_token_ngram_topk_bigrams_and_trigrams(spark):
    from airbyte_destination_spark.functions.text import token_ngram_topk

    docs = spark.createDataFrame(
        [(1, "b a a"), (2, "a b c")], "doc_id bigint, text string"
    )
    bi = [(r.t1, r.t2, r.freq) for r in token_ngram_topk(docs, n=2, k=10).collect()]
    assert bi == [(1, 1, 1), (1, 2, 1), (2, 1, 1), (2, 3, 1)]
    tri = [
        (r.t1, r.t2, r.t3, r.freq)
        for r in token_ngram_topk(docs, n=3, k=10).collect()
    ]
    assert tri == [(1, 2, 3, 1), (2, 1, 1, 1)]


def test_fuzzy_dedup_sorted_neighborhood(spark):
    from airbyte_destination_spark.functions.textdedup import fuzzy_dedup_pairs

    docs = [
        (1, "the quick brown fox jumps over the lazy dog tonight"),
        (2, "the quick brown fox jumps over the lazy dog tonite"),  # 2 edits
        (3, "the quick brown fox jumps over the lazy dog tonight"),  # exact dup of 1
        (4, "completely unrelated text about spark query planning"),
        # edit at the FRONT: prefix blocking misses it, the
        # reversed-prefix pass must catch it
        (5, "a quick brown fox jumps over the lazy dog tonight"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = fuzzy_dedup_pairs(
        df, neighbors=3, max_dist=6, block_len=8, key_cap=128
    )
    rows = {(r.doc_a, r.doc_b): r.dist for r in out.collect()}
    assert rows[(1, 3)] == 0  # exact dup
    assert 0 < rows[(1, 2)] <= 3  # typo-level edit
    assert (1, 5) in rows or (3, 5) in rows  # caught by the suffix pass
    assert not any(4 in p for p in rows)  # unrelated never pairs
    # no SinglePartition window: both passes partition by the block key
    from airbyte_destination_spark.plans import executed_plan

    assert "SinglePartition" not in executed_plan(out)


def test_lm_perplexity_scores_fluent_below_gibberish(spark):
    from airbyte_destination_spark.functions.text import lm_perplexity

    # corpus dominated by one phrase: its transitions are high
    # probability; the shuffled doc uses the same words with unseen
    # transitions and must score strictly higher
    fluent = "the cat sat on the mat"
    docs = [(i, fluent) for i in range(10)] + [
        (10, "mat the on cat the sat"),
        (11, "solo"),  # one word -> no bigram evidence
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r.doc_id: r for r in lm_perplexity(df, alpha=0.5).collect()}
    assert len(out) == 12  # short docs still reported
    assert out[11].n_bigrams == 0 and out[11].cross_entropy is None
    assert out[0].cross_entropy < out[10].cross_entropy
    # perplexity = exp(cross_entropy) after the 6dp round
    import math

    assert out[10].perplexity == round(math.exp(out[10].cross_entropy), 4)


def test_dedup_spans_removes_later_copies_one_exchange(spark):
    from airbyte_destination_spark.functions.text import dedup_spans
    from airbyte_destination_spark.plans import count_exchanges

    blk = " ".join(f"w{i}" for i in range(16))
    rows = [
        ("d1", f"{blk} {blk} middle words here {blk}"),
        ("d2", "short doc"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    out = dedup_spans(df)
    # one exchange: window + rebuild share the doc-id repartition
    # (assert BEFORE collect — the post-AQE string prints the plan twice)
    assert count_exchanges(out) == 1
    got = {r.doc_id: r for r in out.collect()}
    # first copy kept, later copies dropped, remainder in order
    assert got["d1"].text_dedup.startswith(blk)
    assert got["d1"].n_dropped >= 1
    # the deduped text contains the block exactly once at 16-word grain
    blocks = got["d1"].text_dedup.split(" ")
    joined = [" ".join(blocks[i : i + 16]) for i in range(0, len(blocks), 16)]
    assert joined.count(blk) == 1
    assert got["d2"].text_dedup == "short doc" and got["d2"].n_dropped == 0


def test_gopher_quality_rules(spark):
    from airbyte_destination_spark.functions.text import gopher_quality

    good = " ".join(
        ["the quick brown fox jumps over a lazy dog of note and all"] * 5
    )  # 60 words, >=2 distinct stopwords, alpha, no single word dominates
    rows = [
        (1, good),
        (2, "short doc"),                       # fails word-count floor
        (3, " ".join(["spam"] * 60)),           # top-word dominance + no stopwords
        (4, good + " {"),                       # C4 brace rule
        (5, good.replace("dog", "Lorem Ipsum")),# C4 lorem rule
    ]
    out = {
        r["doc_id"]: r.asDict()
        for r in gopher_quality(
            spark.createDataFrame(rows, "doc_id int, text string")
        ).collect()
    }
    assert out[1]["keep"] is True
    assert out[2]["keep"] is False and out[2]["n_words"] == 2
    assert out[3]["keep"] is False and out[3]["frac_top_word"] == 1.0
    assert out[4]["keep"] is False and out[4]["has_brace"]
    assert out[5]["keep"] is False and out[5]["has_lorem"]
    assert out[1]["stop_distinct"] >= 2
    assert 0 < out[1]["frac_top_word"] <= 0.2


def test_semdedup_drops_centroid_closer_member(spark):
    from airbyte_destination_spark.functions.similarity import semdedup

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),   # seed cell 0
        (1, [0.0, 1.0, 0.0, 0.0]),   # seed cell 1
        (2, [100.0, 0.1, 0.0, 0.0]),  # near-parallel to v0: the dup pair
        (3, [0.8, 0.6, 0.0, 0.0]),   # cos to v0 = 0.8 < threshold
        (4, [0.0, 0.9, 0.3, 0.0]),   # cell 1, no partner
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        r["vec_id"]: r.asDict()
        for r in semdedup(df, threshold=0.999, n_cells=2).collect()
    }
    assert len(got) == 5
    pair = {0, 2}
    dropped = {v for v, r in got.items() if not r["keep"]}
    assert len(dropped) == 1 and dropped < pair
    # the keep rule: the dropped member is the one CLOSER to its
    # centroid (keep the outlier)
    d = dropped.pop()
    k = (pair - {d}).pop()
    assert got[d]["cent_cos"] >= got[k]["cent_cos"]
    assert got[d]["cell"] == got[k]["cell"]
    for v in (1, 3, 4):
        assert got[v]["keep"] is True


def test_perplexity_buckets_quartiles_and_null_route(spark):
    from airbyte_destination_spark.functions.text import perplexity_buckets

    rows = [(i, f"w{i % 7} w{(i + 1) % 5} common words here {i % 3}") for i in range(20)]
    rows.append((99, "solo"))  # 1 word -> no bigrams -> NULL bucket
    out = perplexity_buckets(
        spark.createDataFrame(rows, "doc_id int, text string")
    ).collect()
    got = {r["doc_id"]: r for r in out}
    assert len(got) == 21
    assert got[99]["ppl_bucket"] is None and got[99]["perplexity"] is None
    counts = {}
    for r in out:
        counts[r["ppl_bucket"]] = counts.get(r["ppl_bucket"], 0) + 1
    # head <= 25% of scored docs (ties can spill), every scored doc routed
    assert set(counts) <= {"head", "middle", "tail", None}
    assert counts.get("head", 0) >= 1 and counts.get("tail", 0) >= 1
    # bucket ordering is consistent with perplexity ordering
    hp = max(r["perplexity"] for r in out if r["ppl_bucket"] == "head")
    tp = min(r["perplexity"] for r in out if r["ppl_bucket"] == "tail")
    assert hp <= tp


def test_bm25_topk_ranking_and_reference(spark):
    """BM25 against a hand-computed reference on a 4-doc corpus."""
    import math

    from airbyte_destination_spark.functions.text import bm25_topk

    docs = [
        (1, "join join join hash"),          # heavy tf on one term
        (2, "join scan vector"),             # hits all three terms, short
        (3, "sort order group by window"),   # no hits
        (4, "scan scan scan scan scan scan scan scan"),  # long, one term
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: r.bm25 for r in bm25_topk(df, ["join", "scan", "vector"], k=10).collect()}
    assert 3 not in got  # no query term -> no row

    # reference arithmetic (k1=1.2, b=0.75), per-term 6dp then sum
    dls = {1: 4, 2: 3, 4: 8}
    avgdl = (4 + 3 + 5 + 8) / 4.0
    n = 4.0
    tfs = {1: {"join": 3}, 2: {"join": 1, "scan": 1, "vector": 1}, 4: {"scan": 8}}
    dfs = {"join": 2, "scan": 2, "vector": 1}
    for d, terms in tfs.items():
        exp = 0.0
        for t, tf in terms.items():
            idf = math.log(1 + (n - dfs[t] + 0.5) / (dfs[t] + 0.5))
            exp += round(idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dls[d] / avgdl)), 6)
        assert abs(got[d] - round(exp, 6)) < 1e-9, (d, got[d], exp)
    # doc 2 (all three terms, short) must outrank the single-term docs
    assert got[2] > got[1] and got[2] > got[4]


def test_bm25_topk_plans_take_ordered(spark):
    from airbyte_destination_spark.functions.text import bm25_topk

    df = spark.createDataFrame(
        [(i, "join scan vector join") for i in range(50)], "doc_id long, text string"
    )
    plan = (
        bm25_topk(df, ["join", "scan"], k=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan  # never a global sort


def test_token_block_dedup_global_first_occurrence(spark):
    from airbyte_destination_spark.functions.textdedup import token_block_dedup

    rows = [
        (1, [1, 2, 3, 4, 5, 6, 7, 8]),      # two blocks of 4, owner of both
        (2, [1, 2, 3, 4, 9, 9, 9, 9]),      # block 1 dups doc1's -> dropped
        (3, [5, 6, 7, 8, 5, 6, 7, 8, 10]),  # dups doc1 blk2 twice; [10] kept
        (4, []),                            # empty doc must surface
        (5, [1, 2, 3]),                     # short tail-only block, unique
    ]
    df = spark.createDataFrame(rows, "doc_id int, tokens array<int>")
    got = {
        r.doc_id: (list(r.tokens_dedup), r.n_tok_dedup, r.n_blocks, r.n_dropped)
        for r in token_block_dedup(df, block_tokens=4).collect()
    }
    assert got[1] == ([1, 2, 3, 4, 5, 6, 7, 8], 8, 2, 0)
    assert got[2] == ([9, 9, 9, 9], 4, 2, 1)
    assert got[3] == ([10], 1, 3, 2)   # intra-doc later copy dropped too
    assert got[4] == ([], 0, 0, 0)
    assert got[5] == ([1, 2, 3], 3, 1, 0)


def test_token_block_dedup_ownership_no_window_partial_agg(spark):
    """The ownership decision must be a map-side-combined aggregate,
    never a row_number window over the raw block stream (a hot
    boilerplate block would serialize through one task)."""
    from airbyte_destination_spark.functions.textdedup import token_block_dedup
    from airbyte_destination_spark.plans import executed_plan

    df = spark.createDataFrame(
        [(i, list(range(i % 3, i % 3 + 8))) for i in range(40)],
        "doc_id int, tokens array<int>",
    )
    plan = executed_plan(token_block_dedup(df, block_tokens=4))
    assert "Window" not in plan, plan
    assert "partial_min" in plan or "partial min" in plan.lower(), plan


def test_real_decode_ppm_wav_roundtrip(spark):
    """The REAL decode path (fake=False): PPM/WAV payloads built by the
    encoders decode back to exact header dims; checksum/feature come
    from the DECODED arrays (pinned against a local numpy recompute);
    a codec payload raises the declared NotImplementedError."""
    import hashlib

    import numpy as np
    import pytest as _pytest

    from airbyte_destination_spark.functions.multimodal import (
        MEDIA_SCHEMA,
        decode_ppm,
        decode_wav,
        encode_ppm,
        encode_wav,
        extract_features,
    )

    px = (np.arange(12 * 9 * 3, dtype=np.int64) % 256).astype(np.uint8)
    px = px.reshape(9, 12, 3)  # h=9, w=12
    ppm = encode_ppm(px)
    assert (decode_ppm(ppm) == px).all()
    wave = (np.sin(np.arange(500) / 5.0) * 10000).astype(np.int16)
    wav = encode_wav(wave, sample_rate=8000)
    rate, back = decode_wav(wav)
    assert rate == 8000 and (back[:, 0] == wave).all()

    rows = [
        ("img", "image", ppm, {"source": "t"}),
        ("aud", "audio", wav, {"source": "t"}),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r.media_id: r for r in extract_features(df, fake=False).collect()}
    assert (got["img"].width, got["img"].height) == (12, 9)
    assert (got["aud"].width, got["aud"].height) == (500, 1)
    flat = px.astype(np.float32).ravel()
    assert got["img"].checksum == hashlib.sha256(flat.tobytes()).hexdigest()[:16]
    pad = (-flat.size) % 8
    want = np.pad(flat, (0, pad)).reshape(8, -1).mean(axis=1) / 255.0
    assert np.allclose(got["img"].feature, want, atol=1e-6)

    bad = spark.createDataFrame(
        [("j", "image", b"\xff\xd8\xff\xe0JFIF....", {"source": "t"})],
        MEDIA_SCHEMA,
    )
    with _pytest.raises(Exception, match="PPM.*WAV|fake=True"):
        extract_features(bad, fake=False).collect()


def test_resize_nearest_exact_pixels(spark):
    """resize_nearest is a real image op: nearest-neighbor index map,
    pinned pixel-for-pixel against the numpy reference."""
    import numpy as np

    from airbyte_destination_spark.functions.multimodal import (
        decode_ppm,
        resize_nearest,
        synthetic_real_media,
    )

    media = synthetic_real_media(spark, 10, seed=7)
    out = {r.media_id: r for r in resize_nearest(media, 8, 6).collect()}
    assert set(out) == {f"m-{i}" for i in range(0, 10, 2)}  # images only
    src = {r.media_id: bytes(r.content) for r in media.collect()}
    for mid, r in out.items():
        px = decode_ppm(src[mid])
        h, w, _ = px.shape
        yi = (np.arange(6) * h) // 6
        xi = (np.arange(8) * w) // 8
        want = px[yi[:, None], xi[None, :]]
        got = decode_ppm(bytes(r.content))
        assert got.shape == (6, 8, 3) and (got == want).all()
