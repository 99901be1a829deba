"""Large-star/small-star connected components: agreement with min-label
propagation on every topology, O(log^2 depth) round count on deep
chains (the case min-label is worst-case on), and parity through
near_dup_clusters(cc_algorithm="star")."""

import random

import pytest
from pyspark.sql import functions as F

from airbyte_destination_spark.functions.textdedup import (
    connected_components,
    connected_components_star,
    near_dup_clusters,
)


def _pairs(spark, edges):
    return spark.createDataFrame(edges, "doc_a bigint, doc_b bigint")


def _labels(df):
    return sorted((r["node"], r["cluster"]) for r in df.collect())


def test_star_on_path_and_clique(spark):
    path = _pairs(spark, [(i, i + 1) for i in range(20)])
    assert _labels(connected_components_star(path)) == [(i, 0) for i in range(21)]
    clique = _pairs(spark, [(a, b) for a in range(6) for b in range(a + 1, 6)])
    assert _labels(connected_components_star(clique)) == [(i, 0) for i in range(6)]


def test_star_matches_label_on_random_graph(spark):
    rng = random.Random(7)
    edges = list(
        {(rng.randrange(300), rng.randrange(300)) for _ in range(220)}
    )
    edges = [(a, b) for a, b in edges if a != b]
    p = _pairs(spark, edges)
    star = _labels(connected_components_star(p))
    label = _labels(connected_components(p, max_iters=100))
    assert star == label


def test_star_round_count_logarithmic_on_deep_chain(spark):
    """A 256-deep chain needs ~256 min-label rounds; star contraction
    must finish in O(log^2 256) — well under 16 alternations."""
    stats = {}
    chain = _pairs(spark, [(i, i + 1) for i in range(256)])
    out = connected_components_star(chain, max_iters=40, _stats=stats)
    assert _labels(out) == [(i, 0) for i in range(257)]
    assert stats["iters"] <= 16, f"star took {stats['iters']} rounds"


def test_star_disjoint_components_and_empty(spark):
    p = _pairs(spark, [(10, 11), (11, 12), (50, 51), (99, 98)])
    assert _labels(connected_components_star(p)) == [
        (10, 10), (11, 10), (12, 10), (50, 50), (51, 50), (98, 98), (99, 98),
    ]
    empty = _pairs(spark, []).where(F.lit(False))
    assert connected_components_star(empty).count() == 0


@pytest.mark.parametrize("algo", ["star"])
def test_near_dup_clusters_star_parity(spark, algo):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").repartition(4)
    default = near_dup_clusters(docs, n_hashes=8, bands=4, threshold=0.8)
    star = near_dup_clusters(
        docs, n_hashes=8, bands=4, threshold=0.8, cc_algorithm=algo
    )
    assert sorted(map(tuple, star.collect())) == sorted(map(tuple, default.collect()))
