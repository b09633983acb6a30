"""Alternating-star connected components vs a brute-force union-find
oracle, on adversarial shapes: long chains (diameter >> log n, the
case that breaks diameter-bound label propagation), stars, cliques,
random graphs, singletons, self-loops, duplicate edges."""

from __future__ import annotations

import random

import pytest

from target_hdfs_spark.operators.dedup import connected_components


def _uf_components(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    return {v: min(w for w in range(n_nodes) if find(w) == find(v)) for v in range(n_nodes)}


def _check(spark, n_nodes, edges, max_iter=20):
    nodes = spark.createDataFrame([(i,) for i in range(n_nodes)], "doc_id long")
    if edges:
        edf = spark.createDataFrame(edges, "doc_a long, doc_b long")
    else:
        edf = spark.createDataFrame([], "doc_a long, doc_b long")
    got = {
        r.doc_id: r.cluster
        for r in connected_components(nodes, edf, max_iter=max_iter).collect()
    }
    want = _uf_components(n_nodes, edges)
    assert got == want


def test_long_chain(spark):
    # diameter 39: label propagation would need 39 rounds; star
    # contraction needs O(log n)
    _check(spark, 40, [(i, i + 1) for i in range(39)])


def test_two_chains_and_singletons(spark):
    edges = [(i, i + 1) for i in range(10)] + [(20 + i, 21 + i) for i in range(5)]
    _check(spark, 30, edges)


def test_star_and_clique(spark):
    star = [(0, i) for i in range(1, 8)]
    clique = [(i, j) for i in range(10, 15) for j in range(i + 1, 15)]
    _check(spark, 16, star + clique)


def test_self_loops_and_duplicates(spark):
    _check(spark, 6, [(1, 1), (1, 2), (2, 1), (1, 2), (4, 5), (5, 4)])


def test_empty_edges(spark):
    _check(spark, 5, [])


def test_reversed_chain_ids(spark):
    # min label at the END of the chain: worst case for min propagation
    _check(spark, 30, [(i + 1, i) for i in range(29)])


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_random_graphs(spark, seed):
    rng = random.Random(seed)
    n = 60
    edges = [
        (rng.randrange(n), rng.randrange(n)) for _ in range(rng.randrange(10, 80))
    ]
    _check(spark, n, edges)
