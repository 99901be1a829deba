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
