"""Property-based tests (SURVEY §5.3): Catalyst expressions vs numpy/pure
Python references on hypothesis-generated inputs."""

import math

import numpy as np
import pytest
from hypothesis import assume, given, settings, strategies as st
from pyspark.sql import functions as F

from pydata_vector_search_spark.catalog import read_table
from pydata_vector_search_spark.functions import text as T
from pydata_vector_search_spark.functions.vector import (cosine_similarity,
                                                         dot_product,
                                                         l2_distance, l2_norm)
from pydata_vector_search_spark.operators import knn

_fl = st.floats(min_value=-100, max_value=100, allow_nan=False,
                allow_infinity=False)


@st.composite
def vec_pair(draw, max_dim=12):
    dim = draw(st.integers(min_value=1, max_value=max_dim))
    a = draw(st.lists(_fl, min_size=dim, max_size=dim))
    b = draw(st.lists(_fl, min_size=dim, max_size=dim))
    return a, b


@settings(max_examples=25, deadline=None)
@given(vec_pair())
def test_vector_exprs_match_numpy(spark, ab):
    a, b = ab
    na, nb = np.array(a), np.array(b)
    assume(np.linalg.norm(na) > 1e-6 and np.linalg.norm(nb) > 1e-6)
    row = (spark.createDataFrame([(a, b)], "a array<double>, b array<double>")
           .select(dot_product("a", "b").alias("dot"),
                   l2_norm("a").alias("norm"),
                   l2_distance("a", "b").alias("l2"),
                   cosine_similarity("a", "b").alias("cos")).head())
    assert row.dot == pytest.approx(float(na @ nb), rel=1e-9, abs=1e-9)
    assert row.norm == pytest.approx(float(np.linalg.norm(na)), rel=1e-9)
    assert row.l2 == pytest.approx(float(np.linalg.norm(na - nb)), rel=1e-9, abs=1e-9)
    expected_cos = float(na @ nb / (np.linalg.norm(na) * np.linalg.norm(nb)))
    assert row.cos == pytest.approx(expected_cos, rel=1e-9, abs=1e-9)


@settings(max_examples=15, deadline=None)
@given(st.text(alphabet=st.characters(codec="ascii", min_codepoint=32,
                                      max_codepoint=126),
               min_size=0, max_size=60))
def test_rolling_hash_matches_python(spark, s):
    base, mod = 31, 2_147_483_647
    exp = 0
    for ch in s:
        exp = (exp * base + ord(ch)) % mod
    got = (spark.createDataFrame([(s,)], "t string")
           .select(T.rolling_hash("t").alias("h")).head().h)
    assert got == exp


@settings(max_examples=15, deadline=None)
@given(st.lists(st.text(alphabet="abcdef ", min_size=1, max_size=10),
                min_size=1, max_size=8))
def test_token_count_matches_python_split(spark, words):
    s = " ".join(words)
    assume(s.strip())            # whitespace-only input legitimately has 0
    df = spark.createDataFrame([(s,)], "t string")
    n1 = df.select(T.token_count("t").alias("n")).head().n
    n2 = df.select(T.token_count("t").alias("n")).head().n
    assert n1 == n2 == len(s.split())


def test_knn_k_equals_n_is_full_sort(spark, sf_dir):
    """KNN with k = n must equal the complete distance ordering."""
    emb = read_table(spark, sf_dir, "embeddings")
    n = emb.count()
    qv = [float(x) for x in emb.head().embedding]
    got = [r.vec_id for r in knn.vector_search(
        emb, "embedding", qv, k=n, tiebreaker="vec_id").collect()]
    full = [r.vec_id for r in
            emb.withColumn("_d", F.lit(1) - cosine_similarity(
                "embedding", F.array(*[F.lit(x) for x in qv])))
               .orderBy(F.col("_d").asc(), F.col("vec_id").asc()).collect()]
    assert got == full and len(got) == n


def test_prefilter_subset_property(spark, sf_dir):
    """Pre-filter hybrid results always satisfy the predicate and are the
    top-k of the filtered set (SURVEY §5.3)."""
    emb = read_table(spark, sf_dir, "embeddings")
    qv = [float(x) for x in emb.head().embedding]
    pre = knn.vector_search(emb, "embedding", qv, k=5,
                            filter=F.col("label") == 2,
                            tiebreaker="vec_id").collect()
    assert all(r.label == 2 for r in pre)
    filtered_full = knn.vector_search(emb.filter(F.col("label") == 2),
                                      "embedding", qv, k=5,
                                      tiebreaker="vec_id").collect()
    assert [r.vec_id for r in pre] == [r.vec_id for r in filtered_full]


def test_upsert_idempotent(spark, sf_dir):
    """Upserting the same batch twice = once (SURVEY §5.3)."""
    from pydata_vector_search_spark.operators.upsert import merge_last_write_wins
    emb = read_table(spark, sf_dir, "embeddings").limit(20)
    batch = emb.withColumn("label", F.lit(7))
    once = merge_last_write_wins(emb, batch, key="vec_id")
    twice = merge_last_write_wins(once, batch, key="vec_id")
    a = sorted((r.vec_id, r.label) for r in once.collect())
    b = sorted((r.vec_id, r.label) for r in twice.collect())
    assert a == b
