"""Token-space ops: detokenize inversion and token-gram contamination."""

from pyspark.sql import functions as F

from airbyte_destination_spark.functions.text import (
    detokenize,
    freq_vocab,
    token_contamination,
    tokenize_freq_vocab,
)


def test_detokenize_inverts_tokenize_on_corpus(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    toks = tokenize_freq_vocab(docs)
    rebuilt = detokenize(toks, freq_vocab(docs))
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    bad = (
        rebuilt.join(docs.select("doc_id", norm.alias("n")), "doc_id")
        .where(F.col("text_rebuilt") != F.col("n"))
        .count()
    )
    assert bad == 0
    assert rebuilt.count() == docs.count()


def test_token_contamination_known_overlap(spark):
    # probe doc 0 shares tokens 1..8 with doc 1 (one 8-gram) and
    # nothing with doc 2; doc 3 is too short to form a gram.
    rows = [
        (0, list(range(1, 13))),           # probe
        (1, [99, *range(1, 9), 98]),       # one verbatim probe 8-gram
        (2, [50 + i for i in range(12)]),  # disjoint
        (3, list(range(1, 8))),            # len 7 < n
    ]
    toks = spark.createDataFrame(rows, "doc_id long, tokens array<int>")
    probes = spark.createDataFrame([(0,)], "doc_id long")
    got = {r.doc_id: r.n_hit_grams for r in token_contamination(toks, probes, n=8).collect()}
    assert got == {1: 1}


# ---------------------------------------------------------------- BPE


def _bpe_reference(texts, n_merges):
    """Pure-Python BPE twin of the documented spec: overlap-inclusive
    pair counts over the distinct-word frequency table, argmax with
    lexicographic tiebreak, greedy left-to-right non-overlap merge."""
    import collections
    import re

    wc = collections.Counter()
    for t in texts:
        for w in re.split(r"\s+", t.strip().lower()):
            if re.fullmatch(r"[a-z0-9]+", w):
                wc[w] += 1
    seqs = {w: list(w) for w in wc}
    out = []
    for rank in range(1, n_merges + 1):
        pc = collections.Counter()
        for w, s in seqs.items():
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += wc[w]
        if not pc:
            break
        (l, r), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        out.append((rank, l, r, c))
        for w, s in seqs.items():
            new, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == l and s[i + 1] == r:
                    new.append(l + r)
                    i += 2
                else:
                    new.append(s[i])
                    i += 1
            seqs[w] = new
    return out


def test_bpe_merges_matches_reference(spark):
    from airbyte_destination_spark.functions.text import bpe_merges

    texts = [
        "the cat sat on the mat",
        "banana bandana cabana",
        "aaaa aaa the theme thesis",   # run-parity: aaaa -> (aa)(aa)
        "low lower lowest newest widest",
        "Banana BANANA the the the",   # case-folds into the same words
        "emoji éclair skipped!!",  # non-[a-z0-9] words filtered out
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    got = [
        (r.merge_rank, r.lhs, r.rhs, r.pair_count)
        for r in bpe_merges(docs, 8).orderBy("merge_rank").collect()
    ]
    assert got == _bpe_reference(texts, 8)
    # the run-parity case is actually exercised: 'aa' must be learned
    # and applied non-overlapping
    assert ("a", "a") in {(l, r) for _, l, r, _ in got}


def test_bpe_merges_exhausted_corpus_stops_early(spark):
    from airbyte_destination_spark.functions.text import bpe_merges

    docs = spark.createDataFrame(
        [(0, "ab ab ab"), (1, "ab")], "doc_id int, text string"
    )
    got = [
        (r.merge_rank, r.lhs, r.rhs, r.pair_count)
        for r in bpe_merges(docs, 5).orderBy("merge_rank").collect()
    ]
    # one merge exhausts every word; later rounds have no pairs
    assert got == [(1, "a", "b", 4)]


def test_bpe_encode_reproduces_training_segmentation(spark):
    from airbyte_destination_spark.functions.text import bpe_encode, bpe_merges

    texts = [
        "the cat sat on the mat",
        "banana bandana cabana aaaa",
        "low lower lowest  the THE",
        "###",  # no valid words -> doc drops out of the encoding
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    merges = [
        (r.lhs, r.rhs)
        for r in bpe_merges(docs, 6).orderBy("merge_rank").collect()
    ]
    enc = {r.doc_id: list(r.bpe_tokens) for r in bpe_encode(docs, merges).collect()}

    # python twin: final segmentation after applying the merges in order
    import re

    def seg(w):
        s = list(w)
        for l, r in merges:
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == l and s[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            s = out
        return s

    want = {}
    for i, t in enumerate(texts):
        toks = []
        for w in re.split(r"\s+", t.strip().lower()):
            if re.fullmatch(r"[a-z0-9]+", w):
                toks.extend(seg(w))
        if toks:
            want[i] = toks
    assert enc == want
    assert 3 not in enc  # the no-valid-words doc dropped


def test_bpe_encode_with_precomputed_segmentations_identical(spark):
    """Round-6 optimization contract: handing bpe_encode a materialized
    bpe_segmentations table (the trained-tokenizer artifact the entry
    queries stage) must yield byte-identical encodings to the direct
    path that replays the merge rounds internally."""
    from airbyte_destination_spark.functions.text import (
        bpe_encode,
        bpe_merges,
        bpe_segmentations,
    )

    texts = [
        "the cat sat on the mat",
        "banana bandana cabana aaaa",
        "low lower lowest  the THE",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    merges = [
        (r.lhs, r.rhs)
        for r in bpe_merges(docs, 6).orderBy("merge_rank").collect()
    ]
    direct = {
        r.doc_id: (list(r.bpe_tokens), r.n_bpe)
        for r in bpe_encode(docs, merges).collect()
    }
    staged = {
        r.doc_id: (list(r.bpe_tokens), r.n_bpe)
        for r in bpe_encode(
            docs, merges, segmentations=bpe_segmentations(docs, merges)
        ).collect()
    }
    assert direct == staged
