"""Degree-ordered triangle counting (Suri & Vassilvitskii WWW'11)."""

import itertools
import random

from pyspark.sql import functions as F

from pydata_vector_search_spark.operators.graph import triangle_count


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _got(df):
    return {r["node"]: (r["degree"], r["triangles"]) for r in df.collect()}


def _brute(pairs):
    """Pure-Python reference: canonical undirected set, all-triples scan."""
    es = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
    nodes = sorted({n for e in es for n in e})
    deg = {n: 0 for n in nodes}
    for a, b in es:
        deg[a] += 1
        deg[b] += 1
    tri = {n: 0 for n in nodes}
    for a, b, c in itertools.combinations(nodes, 3):
        if (a, b) in es and (a, c) in es and (b, c) in es:
            tri[a] += 1
            tri[b] += 1
            tri[c] += 1
    return {n: (deg[n], tri[n]) for n in nodes}


def test_k4_every_node_in_three_triangles(spark):
    k4 = [(a, b) for a, b in itertools.combinations(range(4), 2)]
    assert _got(triangle_count(_edges(spark, k4))) == \
        {n: (3, 3) for n in range(4)}


def test_ring_has_no_triangles(spark):
    ring = [(i, (i + 1) % 6) for i in range(6)]
    assert _got(triangle_count(_edges(spark, ring))) == \
        {n: (2, 0) for n in range(6)}


def test_shared_edge_triangles(spark):
    # two triangles glued on edge (0,1): 0 and 1 sit in both
    pairs = [(0, 1), (0, 2), (1, 2), (0, 3), (1, 3)]
    assert _got(triangle_count(_edges(spark, pairs))) == \
        {0: (3, 2), 1: (3, 2), 2: (2, 1), 3: (2, 1)}


def test_direction_duplicates_and_self_loops_ignored(spark):
    a = triangle_count(_edges(spark, [(0, 1), (1, 2), (2, 0)]))
    b = triangle_count(_edges(spark, [(1, 0), (1, 0), (2, 1), (0, 2),
                                      (2, 0), (1, 1)]))
    assert _got(a) == _got(b) == {0: (2, 1), 1: (2, 1), 2: (2, 1)}


def test_star_graph_whale_node_zero_triangles(spark):
    # the curse-of-the-last-reducer shape: one hub, no closures. The
    # orientation points every edge AT the hub, so the hub's
    # out-neighbourhood is empty and no quadratic wedge set exists.
    star = [(100, i) for i in range(40)]
    got = _got(triangle_count(_edges(spark, star)))
    assert got[100] == (40, 0)
    assert all(got[i] == (1, 0) for i in range(40))


def test_random_graphs_match_bruteforce(spark):
    rng = random.Random(90)
    for trial in range(4):
        n = rng.randint(6, 14)
        pairs = [(rng.randrange(n), rng.randrange(n))
                 for _ in range(rng.randint(5, 40))]
        pairs = [p for p in pairs if p[0] != p[1]]
        if not pairs:
            continue
        got = _got(triangle_count(_edges(spark, pairs)))
        assert got == _brute(pairs), f"trial {trial}: {sorted(pairs)}"


def test_global_count_matches_handshake(spark):
    # sum of per-node counts is 3x the number of distinct triangles
    k5 = [(a, b) for a, b in itertools.combinations(range(5), 2)]
    df = triangle_count(_edges(spark, k5))
    total = df.agg(F.sum("triangles")).collect()[0][0]
    assert total == 3 * 10  # C(5,3) triangles in K5
