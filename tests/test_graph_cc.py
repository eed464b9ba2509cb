"""Large-star/small-star connected components: correctness vs a Python
union-find on seeded random graphs, and the convergence-speed property
that justifies the algorithm (rounds << diameter)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from flow_spark.operators.graph import cc_star


def _union_find(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min node of the component
    return {n: find(n) for n in parent}


def _check(spark, edges: list[tuple[int, int]]) -> int:
    df = spark.createDataFrame(edges, "a long, b long")
    got = {r["id"]: r["component"] for r in cc_star(df).collect()}
    want = _union_find(edges)
    # union-find with min-root union gives min-label components directly
    assert got == want
    return cc_star.last_rounds


def test_cc_random_graphs(spark):
    rng = random.Random(42)
    for trial in range(4):
        n = rng.randrange(20, 120)
        m = rng.randrange(n // 2, 2 * n)
        edges = [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(m)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        if not edges:
            edges = [(0, 1)]
        _check(spark, edges)


def test_cc_long_chain_converges_in_log_rounds(spark):
    # a 200-node path has diameter 199: min-label propagation would need
    # ~199 shuffle rounds; large-star/small-star must stay logarithmic.
    chain = [(i, i + 1) for i in range(199)]
    rounds = _check(spark, chain)
    assert rounds <= 12, rounds


def test_cc_disjoint_components_and_selfloop_edges(spark):
    edges = [(5, 5), (1, 2), (2, 3), (10, 11), (12, 11), (20, 21)]
    df = spark.createDataFrame(edges, "a long, b long")
    got = {r["id"]: r["component"] for r in cc_star(df).collect()}
    # (5,5) is a pure self-loop: no edge survives canonicalization, so the
    # node does not appear (documented: size-1 components are the caller's
    # concern)
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}
