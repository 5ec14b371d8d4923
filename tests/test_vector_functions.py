"""Property tests: distance expressions vs numpy (SURVEY.md §5.3)."""

import math
import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from pydata_vector_search_spark.functions.vector import (
    cosine_distance, cosine_similarity, dot_product, l2_distance, l2_norm,
    query_vector_lit,
)

random.seed(7)


def _rand_vecs(n, dim):
    return [[random.uniform(-1, 1) for _ in range(dim)] for _ in range(n)]


@pytest.fixture(scope="module")
def vec_df(spark):
    rows = [(i, a, b) for i, (a, b) in enumerate(zip(_rand_vecs(25, 16), _rand_vecs(25, 16)))]
    return spark.createDataFrame(rows, "id int, a array<double>, b array<double>").cache()


def test_dot_vs_numpy(vec_df):
    got = vec_df.select("id", dot_product("a", "b").alias("d"),
                        "a", "b").collect()
    for r in got:
        assert math.isclose(r.d, float(np.dot(r.a, r.b)), rel_tol=1e-9)


def test_l2_and_cosine_vs_numpy(vec_df):
    got = vec_df.select("id", l2_norm("a").alias("na"),
                        l2_distance("a", "b").alias("l2"),
                        cosine_similarity("a", "b").alias("cs"),
                        "a", "b").collect()
    for r in got:
        a, b = np.array(r.a), np.array(r.b)
        assert math.isclose(r.na, float(np.linalg.norm(a)), rel_tol=1e-9)
        assert math.isclose(r.l2, float(np.linalg.norm(a - b)), rel_tol=1e-9)
        assert math.isclose(
            r.cs, float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b))),
            rel_tol=1e-9)


def test_cosine_self_distance_zero(spark):
    v = [0.5, -1.5, 2.0, 3.25]
    df = spark.createDataFrame([(v,)], "v array<double>")
    d = df.select(cosine_distance("v", query_vector_lit(v)).alias("d")).head().d
    assert abs(d) < 1e-12


def test_embed_text_mllib_tfidf(spark, sf_dir):
    from pyspark.sql import functions as F

    from pydata_vector_search_spark.catalog import read_table
    from pydata_vector_search_spark.operators import knn
    from pydata_vector_search_spark.operators.embedding import embed_text_mllib

    docs = read_table(spark, sf_dir, "documents").limit(100)
    emb = embed_text_mllib(docs, "text", dim=32)
    row = emb.select(F.size("embedding").alias("d")).head()
    assert row.d == 32
    assert dict(emb.dtypes)["embedding"] == "array<float>"
    # TF-IDF vectors feed the standard KNN path
    qv = [float(x) for x in emb.head().embedding]
    hits = knn.vector_search(emb, "embedding", qv, k=3,
                             tiebreaker="doc_id").collect()
    assert len(hits) == 3 and hits[0]._distance < 1e-6
