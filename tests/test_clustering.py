"""Integer-exact k-means (operators/clustering): bit-exact parity with
a pure-Python integer reference, partition invariance, tie/empty-cluster
rules, domain guards, and the SemDeDup composition."""

import math
import random

import pytest
from pyspark.sql import functions as F

from pydata_vector_search_spark.operators.clustering import (
    KMeansModel, kmeans_assign, kmeans_neardup_pairs, kmeans_train,
    semantic_dedup_kmeans)

SCALE = 10 ** 6


def _quant(v, offset=1.0):
    return tuple(int(math.floor((float(x) + offset) * SCALE)) for x in v)


def _py_kmeans(rows, k, iterations, offset=1.0):
    """Reference: same integer recurrence, plain Python ints."""
    q = {i: _quant(v, offset) for i, v in rows}
    ids = sorted(q)
    cents = [q[i] for i in ids[:k]]

    def best(i):
        return min(range(k),
                   key=lambda c: (sum((a - b) ** 2
                                      for a, b in zip(q[i], cents[c])), c))

    for _ in range(iterations):
        assign = {i: best(i) for i in ids}
        new = []
        for c in range(k):
            members = [q[i] for i in ids if assign[i] == c]
            if not members:
                new.append(cents[c])
                continue
            new.append(tuple(sum(col) // len(members)
                             for col in zip(*members)))
        cents = new
    final = {}
    for i in ids:
        c = best(i)
        final[i] = (c, sum((a - b) ** 2 for a, b in zip(q[i], cents[c])))
    return [tuple(c) for c in cents], final


def _rand_rows(n, dim, seed):
    rng = random.Random(seed)
    return [(i, [round(rng.uniform(-0.9, 0.9), 4) for _ in range(dim)])
            for i in range(n)]


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, vec array<double>")


def test_kmeans_matches_python_reference(spark):
    rows = _rand_rows(60, 8, seed=7)
    want_c, want_a = _py_kmeans(rows, k=4, iterations=3)
    model = kmeans_train(_df(spark, rows), "vec", "id", k=4, iterations=3)
    assert list(model.centroids) == want_c
    got = {r.id: (r.cluster_id, r.dist_units) for r in
           kmeans_assign(_df(spark, rows), model, "vec").collect()}
    assert got == want_a


def test_kmeans_partition_invariant(spark):
    rows = _rand_rows(50, 6, seed=11)
    m1 = kmeans_train(_df(spark, rows).repartition(1), "vec", "id",
                      k=3, iterations=2)
    m7 = kmeans_train(_df(spark, rows).repartition(7), "vec", "id",
                      k=3, iterations=2)
    assert m1.centroids == m7.centroids


def test_kmeans_tiebreak_lowest_cluster(spark):
    # seeds 0 and 1 are IDENTICAL points; with iterations=0 both
    # centroids coincide, so EVERY row ties between cluster 0 and 1
    # and must land in 0 (ties to the lowest cluster id)
    rows = [(0, [0.5, 0.5]), (1, [0.5, 0.5]), (2, [0.4, 0.6]),
            (3, [0.45, 0.55])]
    model = kmeans_train(_df(spark, rows), "vec", "id", k=2, iterations=0)
    assigned = kmeans_assign(_df(spark, rows), model, "vec").collect()
    assert {r.cluster_id for r in assigned} == {0}
    assert model.centroids[0] == model.centroids[1] == _quant([0.5, 0.5])


def test_kmeans_empty_cluster_keeps_previous(spark):
    rows = _rand_rows(20, 4, seed=3)
    want_c, _ = _py_kmeans(rows, k=6, iterations=3)
    model = kmeans_train(_df(spark, rows), "vec", "id", k=6, iterations=3)
    assert list(model.centroids) == want_c


def test_kmeans_zero_iterations_is_seeds(spark):
    rows = _rand_rows(10, 3, seed=5)
    model = kmeans_train(_df(spark, rows), "vec", "id", k=2, iterations=0)
    assert list(model.centroids) == [_quant(rows[0][1]), _quant(rows[1][1])]


def test_kmeans_guards(spark):
    df = _df(spark, _rand_rows(5, 3, seed=1))
    with pytest.raises(ValueError, match="k must be"):
        kmeans_train(df, "vec", "id", k=0)
    with pytest.raises(ValueError, match="iterations"):
        kmeans_train(df, "vec", "id", k=2, iterations=-1)
    with pytest.raises(ValueError, match="only 5 rows"):
        kmeans_train(df, "vec", "id", k=9)


def test_kmeans_domain_guard_raises(spark):
    # a coordinate <= -offset quantizes negative: the integer-mean
    # contract is violated and the assigner must refuse
    rows = [(0, [0.1, 0.2]), (1, [-1.5, 0.0]), (2, [0.3, 0.1])]
    model = KMeansModel((_quant([0.1, 0.2]),), SCALE, 1.0)
    with pytest.raises(Exception, match="quantized coordinate"):
        kmeans_assign(_df(spark, rows), model, "vec").collect()


def _py_semdedup_survivors(rows, k, iterations, threshold, round_to=6):
    cents, final = _py_kmeans(rows, k, iterations)
    by_c = {}
    for i, (c, _) in final.items():
        by_c.setdefault(c, []).append(i)
    vec = dict(rows)

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a)) or 1.0
        nb = math.sqrt(sum(x * x for x in b)) or 1.0
        s = num / (na * nb)
        sc = 10 ** round_to
        return math.copysign(math.floor(abs(s) * sc + 0.5) / sc, s)

    parent = {i for i, _ in rows}
    parent = {i: i for i in parent}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for members in by_c.values():
        for a in range(len(members)):
            for b in range(a + 1, len(members)):
                i, j = members[a], members[b]
                if cos(vec[i], vec[j]) >= threshold:
                    ri, rj = find(i), find(j)
                    if ri != rj:
                        parent[max(ri, rj)] = min(ri, rj)
    comp = {}
    for i in parent:
        comp.setdefault(find(i), []).append(i)
    return sorted(min(m) for m in comp.values())


def test_semantic_dedup_kmeans_matches_bruteforce(spark):
    rng = random.Random(17)
    rows = []
    # 6 tight groups of paraphrase-like vectors + noise singletons
    for g in range(6):
        base = [rng.uniform(-0.8, 0.8) for _ in range(8)]
        for j in range(4):
            rows.append((g * 10 + j,
                         [round(x + rng.uniform(-0.01, 0.01), 4)
                          for x in base]))
    for s in range(100, 110):
        rows.append((s, [round(rng.uniform(-0.9, 0.9), 4)
                         for _ in range(8)]))
    want = _py_semdedup_survivors(rows, k=4, iterations=2, threshold=0.95)
    got = sorted(r.id for r in
                 semantic_dedup_kmeans(_df(spark, rows), "vec", "id",
                                       k=4, iterations=2,
                                       threshold=0.95).collect())
    assert got == want


def test_kmeans_pairs_sorted_ids(spark):
    rows = _rand_rows(30, 6, seed=23)
    pairs = kmeans_neardup_pairs(_df(spark, rows), "vec", "id",
                                 k=3, iterations=1,
                                 threshold=-1.0).collect()
    assert pairs, "threshold=-1 must emit every within-cluster pair"
    assert all(p.id_1 < p.id_2 for p in pairs)


def test_kmeans_null_vector_raises(spark):
    rows = [(0, [0.1, 0.2]), (1, None), (2, [0.3, 0.1])]
    df = spark.createDataFrame(rows, "id long, vec array<double>")
    with pytest.raises(ValueError, match="NULL vector"):
        kmeans_train(df, "vec", "id", k=2, iterations=1)
    model = KMeansModel((_quant([0.1, 0.2]),), SCALE, 1.0)
    with pytest.raises(Exception, match="NULL vector"):
        kmeans_assign(df, model, "vec").collect()


def test_kmeans_ragged_vector_raises(spark):
    rows = [(0, [0.1, 0.2]), (1, [0.3, 0.1, 0.5]), (2, [0.2, 0.4])]
    df = spark.createDataFrame(rows, "id long, vec array<double>")
    with pytest.raises(Exception, match="ragged"):
        kmeans_train(df, "vec", "id", k=2, iterations=1)
