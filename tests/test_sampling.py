"""Grouped top-n tournament (operators/sampling): exact equality with
the single-window spelling, whale-group/partition invariance, guards,
and the cluster-balanced sample composition."""

import random

import pytest
from pyspark.sql import Window, functions as F

from pydata_vector_search_spark.operators.sampling import (cluster_sample,
                                                           top_n_per_group)


def _naive(df, group_col, order_cols, n):
    w = Window.partitionBy(group_col).orderBy(*order_cols)
    return (df.withColumn("__rn", F.row_number().over(w))
              .filter(F.col("__rn") <= n).drop("__rn"))


def _rows(n_rows, n_groups, seed):
    rng = random.Random(seed)
    return [(i, rng.randrange(n_groups), rng.randrange(1000))
            for i in range(n_rows)]


def test_tournament_equals_single_window(spark):
    df = spark.createDataFrame(_rows(400, 7, seed=3),
                               "id long, g int, v int")
    order = [F.col("v"), F.col("id")]
    got = sorted((r.g, r.id) for r in
                 top_n_per_group(df, "g", order, 10, id_col="id",
                                 salt_buckets=8).collect())
    want = sorted((r.g, r.id) for r in _naive(df, "g", order, 10).collect())
    assert got == want and got


def test_tournament_small_groups_and_n_exceeds_group(spark):
    # groups smaller than n: everything survives, both paths
    df = spark.createDataFrame(_rows(30, 10, seed=5),
                               "id long, g int, v int")
    order = [F.col("v"), F.col("id")]
    got = sorted(r.id for r in
                 top_n_per_group(df, "g", order, 50, id_col="id").collect())
    assert got == sorted(r.id for r in df.collect())


def test_tournament_partition_invariant(spark):
    df = spark.createDataFrame(_rows(300, 3, seed=9),
                               "id long, g int, v int")
    order = [F.col("v").desc(), F.col("id")]
    a = sorted((r.g, r.id) for r in
               top_n_per_group(df.repartition(1), "g", order, 7,
                               id_col="id", salt_buckets=4).collect())
    b = sorted((r.g, r.id) for r in
               top_n_per_group(df.repartition(13), "g", order, 7,
                               id_col="id", salt_buckets=4).collect())
    assert a == b and len(a) == 21


def test_tournament_salt1_is_plain_window(spark):
    df = spark.createDataFrame(_rows(100, 4, seed=1),
                               "id long, g int, v int")
    order = [F.col("v"), F.col("id")]
    got = sorted((r.g, r.id) for r in
                 top_n_per_group(df, "g", order, 5,
                                 salt_buckets=1).collect())
    want = sorted((r.g, r.id) for r in _naive(df, "g", order, 5).collect())
    assert got == want


def test_tournament_guards(spark):
    df = spark.createDataFrame(_rows(10, 2, seed=2),
                               "id long, g int, v int")
    with pytest.raises(ValueError, match="n must be"):
        top_n_per_group(df, "g", ["v"], 0, id_col="id")
    with pytest.raises(ValueError, match="salt_buckets"):
        top_n_per_group(df, "g", ["v"], 3, id_col="id", salt_buckets=0)
    with pytest.raises(ValueError, match="id_col is required"):
        top_n_per_group(df, "g", ["v"], 3)


def test_cluster_sample_matches_naive_composition(spark):
    rng = random.Random(31)
    rows = [(i, [round(rng.uniform(-0.9, 0.9), 4) for _ in range(6)])
            for i in range(120)]
    df = spark.createDataFrame(rows, "id long, vec array<double>")
    got = sorted((r.cluster_id, r.id) for r in
                 cluster_sample(df, "vec", "id", k=3, iterations=2,
                                per_cluster=8, salt_buckets=4).collect())
    from pydata_vector_search_spark.operators.clustering import (
        kmeans_assign, kmeans_train)
    model = kmeans_train(df, "vec", "id", k=3, iterations=2)
    assigned = kmeans_assign(df, model, "vec")
    order = [F.md5(F.col("id").cast("string")), F.col("id")]
    want = sorted((r.cluster_id, r.id) for r in
                  _naive(assigned, "cluster_id", order, 8).collect())
    assert got == want and len(got) == 24
