"""Compact-forward triangle counting: correctness under hub skew.

The wedge join in ``triangle_count`` is oriented by (degree, id) rank so
a triangle is counted exactly once at its lowest-rank vertex and wedge
lists are bounded by orientation OUT-degree (O(sqrt(m))), not a hub's
raw degree — the r3 skew hardening for power-law near-dup graphs.
These tests pin the count on exactly the graphs where a naive raw-id
wedge join and an orientation bug diverge: one dominant hub, ties in
degree, and random graphs vs a brute-force census."""

from __future__ import annotations

import itertools
import random

from pyspark.sql import functions as F

from data_ingestion_system_spark.operators.queries_dedup import (
    triangle_count,
)


def _census(spark, pairs):
    e = spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in pairs],
        "id_a long, id_b long").distinct()
    deg = (e.select(F.col("id_a").alias("node"))
           .unionAll(e.select(F.col("id_b").alias("node")))
           .groupBy("node").agg(F.count("*").alias("d")))
    return triangle_count(e, deg).collect()[0]["n_triangles"]


def _brute(pairs):
    es = {frozenset(p) for p in pairs}
    nodes = sorted({n for p in es for n in p})
    return sum(1 for t in itertools.combinations(nodes, 3)
               if all(frozenset(c) in es for c in
                      itertools.combinations(t, 2)))


def test_hub_star_with_closures(spark):
    """One hub (degree 21) + three leaf-leaf closures: the skewed shape
    the compact-forward orientation exists for.  Every triangle includes
    the hub, and under (degree, id) rank the hub is each triangle's
    HIGHEST-rank vertex — so the count comes entirely from leaf wedges,
    never from the hub's quadratic wedge list."""
    hub = 0
    pairs = [(hub, i) for i in range(1, 22)]
    pairs += [(1, 2), (3, 4), (5, 6)]
    assert _census(spark, pairs) == 3


def test_complete_graph_all_degrees_tie(spark):
    """K6: every degree ties at 5, so orientation falls back to id order
    — C(6,3) = 20 triangles, each counted exactly once."""
    pairs = list(itertools.combinations(range(6), 2))
    assert _census(spark, pairs) == 20


def test_two_hubs_sharing_leaves(spark):
    """Double-star: hubs u,v adjacent, sharing k leaves — k triangles,
    all through the (u,v) edge, exercising the high-high oriented edge."""
    k = 15
    pairs = [(100, 200)]
    pairs += [(100, i) for i in range(k)]
    pairs += [(200, i) for i in range(k)]
    assert _census(spark, pairs) == k


def test_random_graphs_match_bruteforce(spark):
    rng = random.Random(7)
    for trial in range(3):
        n, m = 18, 40
        pairs = set()
        while len(pairs) < m:
            a, b = rng.sample(range(n), 2)
            pairs.add((min(a, b), max(a, b)))
        assert _census(spark, pairs) == _brute(pairs), sorted(pairs)


def test_triangle_free_graph(spark):
    """Bipartite graphs have no triangles regardless of degree skew."""
    pairs = [(a, 100 + b) for a in range(5) for b in range(8)]
    assert _census(spark, pairs) == 0
