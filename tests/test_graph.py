"""Connected-components / dedup-clustering operator tests."""

import pytest

from pydata_vector_search_spark.operators.graph import (cluster_summary,
                                                        connected_components)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_chain_merges_transitively(spark):
    # A~B, B~C must land in one component even though A~C was never emitted.
    comps = connected_components(_edges(spark, [(1, 2), (2, 3), (10, 11)]))
    got = {r["node"]: r["component"] for r in comps.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_direction_and_duplicates_ignored(spark):
    a = connected_components(_edges(spark, [(2, 1), (3, 2), (11, 10)]))
    b = connected_components(
        _edges(spark, [(1, 2), (1, 2), (2, 3), (3, 2), (10, 11)]))
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_long_chain_converges(spark):
    # a 12-node path needs multiple propagation rounds (diameter ~ 11)
    comps = connected_components(
        _edges(spark, [(i, i + 1) for i in range(12)]), max_iter=25)
    assert {r["component"] for r in comps.collect()} == {0}


def test_self_loops_are_inert(spark):
    comps = connected_components(_edges(spark, [(5, 5), (5, 6)]))
    got = {r["node"]: r["component"] for r in comps.collect()}
    assert got == {5: 5, 6: 5}


def test_nonconvergence_raises(spark):
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(
            _edges(spark, [(i, i + 1) for i in range(12)]), max_iter=1,
            local_threshold=0)


def test_long_path_converges_in_log_rounds(spark):
    # Pointer jumping shortcuts label chains exponentially: a 200-node
    # path (diameter 199) must converge well within 12 rounds — plain
    # diameter-bound propagation would need ~199.
    comps = connected_components(
        _edges(spark, [(i, i + 1) for i in range(200)]), max_iter=12,
        local_threshold=0)
    assert {r["component"] for r in comps.collect()} == {0}


def _uf_components(pairs):
    # pure-python union-find reference
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            # attach max under min → every root is its component's minimum
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in list(parent)}


def test_random_graphs_match_union_find(spark):
    # deterministic pseudo-random graphs across shapes: sparse, dense,
    # many components, star, two cliques bridged
    import random
    for seed in range(5):
        rng = random.Random(seed)
        n = rng.randint(5, 40)
        m = rng.randint(1, 80)
        pairs = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
        pairs = [(a, b) for a, b in pairs if a != b] or [(0, 1)]
        got = {r["node"]: r["component"]
               for r in connected_components(_edges(spark, pairs)).collect()}
        # union-find roots are already the component minimum (min-merge)
        assert got == _uf_components(pairs), f"seed={seed}"


def test_cluster_summary_rollup(spark):
    out = cluster_summary(
        _edges(spark, [(1, 2), (2, 3), (10, 11)])).collect()
    assert [tuple(r) for r in out] == [(1, 3, 3), (10, 2, 11)]


def test_local_and_distributed_paths_agree(spark):
    """The driver-side union-find fast path must produce exactly the
    distributed loop's labels (min reachable id per node)."""
    import random
    rng = random.Random(11)
    pairs = [(rng.randrange(120), rng.randrange(120)) for _ in range(150)]
    e = _edges(spark, pairs)
    local = {(r.node, r.component)
             for r in connected_components(e).collect()}
    dist = {(r.node, r.component)
            for r in connected_components(e, local_threshold=0).collect()}
    assert local == dist and local


def test_non_integral_ids_raise(spark):
    # r09 ADVICE: string ids would cast to NULL and silently drop every
    # edge; the guard raises instead.
    e = spark.createDataFrame([("a", "b")], "src string, dst string")
    with pytest.raises(TypeError, match="must be integral"):
        connected_components(e)


def test_scale0_decimal_ids_allowed(spark):
    # r10 ADVICE: decimal(p<=18, 0) ids (common in parquet/TPC-H
    # writers) cast to long exactly — they must keep working; wide or
    # fractional decimals still raise.
    from pyspark.sql import functions as F
    e = (spark.createDataFrame([(1, 2), (2, 3), (10, 11)], "s long, d long")
         .select(F.col("s").cast("decimal(18,0)").alias("src"),
                 F.col("d").cast("decimal(18,0)").alias("dst")))
    got = {(r.node, r.component) for r in connected_components(e).collect()}
    assert got == {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)}
    bad = e.select(F.col("src").cast("decimal(20,0)").alias("src"), "dst")
    with pytest.raises(TypeError, match="must be integral"):
        connected_components(bad)
    frac = e.select(F.col("src").cast("decimal(10,2)").alias("src"), "dst")
    with pytest.raises(TypeError, match="must be integral"):
        connected_components(frac)


def test_semantic_dedup_kmeans_rejects_string_ids(spark):
    from pydata_vector_search_spark.operators.clustering import \
        semantic_dedup_kmeans
    df = spark.createDataFrame(
        [(f"d{i}", [float(i), float(i % 3)]) for i in range(8)],
        "sid string, v array<double>")
    with pytest.raises(TypeError, match="must be integral"):
        semantic_dedup_kmeans(df, "v", "sid", k=2, iterations=1,
                              threshold=0.5).collect()
