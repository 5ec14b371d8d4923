"""BM25 + RRF lexical/hybrid retrieval (operators/retrieval)."""

import math

import pytest
from pyspark.sql import functions as F

from pydata_vector_search_spark.operators.retrieval import (bm25_search,
                                                            rrf_fuse)


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [(1, "vector search with vector index"),     # tf(vector)=2, dl=5
         (2, "hash join and merge join strategies"), # tf(join)=2, dl=6
         (3, "a stream of events"),                  # tf(stream)=1, dl=4
         (4, "nothing relevant here at all"),        # no query terms, dl=5
         (5, "vector")],                             # tf=1, dl=1
        "doc_id int, text string").cache()


def _bm25(tf, dl, n, sumdl, df, k1=1.2, b=0.75):
    idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    s = idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl * n / sumdl))
    return math.floor(s * 1_000_000 + 0.5) / 1_000_000


def test_bm25_matches_hand_computation(corpus):
    got = {r.doc_id: r.bm25 for r in bm25_search(
        corpus, "text", "doc_id", ("vector", "join", "stream"), k=10
    ).collect()}
    n, sumdl = 5.0, 21.0
    want = {
        1: _bm25(2, 5, n, sumdl, df=2),              # vector in docs 1,5
        2: _bm25(2, 6, n, sumdl, df=1),              # join only in doc 2
        3: _bm25(1, 4, n, sumdl, df=1),
        5: _bm25(1, 1, n, sumdl, df=2),
    }
    assert set(got) == set(want)                     # doc 4 never surfaces
    for d in want:
        assert got[d] == pytest.approx(want[d], abs=2e-6), d


def test_bm25_order_and_k(corpus):
    rows = bm25_search(corpus, "text", "doc_id",
                       ("vector", "join", "stream"), k=2).collect()
    assert len(rows) == 2
    scores = [r.bm25 for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_rrf_fuse_membership_and_scores(spark):
    a = spark.createDataFrame([(1, 9.0), (2, 5.0), (3, 1.0)],
                              "doc_id int, s double")
    b = spark.createDataFrame([(3, 0.1), (4, 0.2)],
                              "doc_id int, _distance double")
    out = {r.doc_id: (r.rrf, r.rank_lex, r.rank_vec) for r in rrf_fuse(
        a, b, "doc_id", k0=60, k=10,
        b_order=[F.col("_distance").asc(), F.col("doc_id").asc()]
    ).collect()}
    assert set(out) == {1, 2, 3, 4}
    # doc 3: rank 3 lexically, rank 1 by vector
    assert out[3] == (round(1 / 63 + 1 / 61, 6), 3, 1)
    # one-sided entries contribute a single reciprocal
    assert out[1] == (round(1 / 61, 6), 1, None)
    assert out[4] == (round(1 / 62, 6), None, 2)
    # doc 3 (in both lists) outranks every one-sided doc here
    top = max(out, key=lambda d: out[d][0])
    assert top == 3


def test_validate_rules(spark):
    from pydata_vector_search_spark.operators import quality as Q
    df = spark.createDataFrame(
        [(1, "a@x.io", 10.0), (2, None, 200.0), (2, "bad", -5.0),
         (4, "c@y.io", None)],
        "id int, email string, amt double")
    dim = spark.createDataFrame([(1,), (2,)], "id int")
    rep = {r.rule: (r.violations, r.total) for r in Q.validate(df, [
        Q.not_null("email"),
        Q.unique("id"),
        Q.in_range("amt", 0.0, 100.0),
        Q.matches("email", r"^[^@]+@[^@]+$"),
        Q.check("amt_set", "amt IS NOT NULL"),
        Q.references("id", dim, "id"),
    ]).collect()}
    assert rep == {
        "not_null:email": (1, 4),
        "unique:id": (2, 4),          # both members of the dup group
        "in_range:amt": (2, 4),       # 200 and -5; NULL passes
        "matches:email": (1, 4),      # 'bad'; NULL passes
        "check:amt_set": (1, 4),
        "references:id": (1, 4),      # id=4 orphan
    }


def test_profile(spark):
    from pydata_vector_search_spark.operators.quality import profile
    df = spark.createDataFrame(
        [(1, "x", 2.0), (2, "y", None), (2, None, 9.5)],
        "id int, s string, v double")
    rep = {r.column: (r.n_rows, r.n_null, r.n_distinct,
                      r.min_value, r.max_value)
           for r in profile(df).collect()}
    assert rep["id"] == (3, 0, 2, "1", "2")
    assert rep["s"] == (3, 1, 2, "x", "y")
    assert rep["v"] == (3, 1, 2, "2.0", "9.5")
    # approx mode keeps the same shape
    approx = {r.column for r in profile(df, exact_distinct=False).collect()}
    assert approx == {"id", "s", "v"}


def test_mmr_demotes_near_duplicates(spark):
    from pydata_vector_search_spark.operators.retrieval import mmr_rerank
    # query NOT colinear with the duplicate cluster: with q == v1,
    # redundancy to {v1} equals relevance and MMR stays monotone in
    # relevance for any lambda — no diversification to observe
    q = [0.9, 0.45]
    hits = spark.createDataFrame(
        [(1, [1.0, 0.0]),        # most relevant direction
         (2, [0.999, 0.01]),     # near-dup of 1
         (3, [0.45, 0.9]),       # distinct direction, decent relevance
         (4, [0.995, 0.02])],    # another near-dup of 1
        "doc_id long, v array<double>")
    out = [r.doc_id for r in mmr_rerank(
        hits, "doc_id", "v", q, k=3, lamb=0.5)
        .orderBy("mmr_rank").collect()]
    assert out[0] == 4                    # relevance first (tilted to q)
    assert out[1] == 3                    # diversity beats the near-dups
    # lambda=1 degenerates to plain similarity order
    plain = [r.doc_id for r in mmr_rerank(
        hits, "doc_id", "v", q, k=3, lamb=1.0)
        .orderBy("mmr_rank").collect()]
    assert plain == [4, 2, 1]
    # empty input stays empty with a stable schema
    assert mmr_rerank(hits.filter("doc_id < 0"), "doc_id", "v",
                      [1.0, 0.0]).count() == 0


def test_validate_empty_table_and_empty_rules(spark):
    """ADVICE r05: an empty table must read all-zero (F.sum over zero
    rows is NULL without the coalesce), and an empty rule set raises
    instead of crashing reduce()."""
    from pydata_vector_search_spark.operators import quality as Q
    df = spark.createDataFrame([], "id int, email string")
    rep = {r.rule: (r.violations, r.total) for r in Q.validate(df, [
        Q.not_null("email"),
        Q.unique("id"),
        Q.check("pos", "id > 0"),
        Q.references("id", spark.createDataFrame([(1,)], "id int"), "id"),
    ]).collect()}
    assert rep == {"not_null:email": (0, 0), "unique:id": (0, 0),
                   "check:pos": (0, 0), "references:id": (0, 0)}
    with pytest.raises(ValueError, match="at least one rule"):
        Q.validate(df, [])


def test_validate_and_profile_quoted_names(spark):
    """ADVICE r05: rule/column names containing quotes or backticks must
    not break parsing (names are literals now, never SQL text)."""
    from pydata_vector_search_spark.operators import quality as Q
    weird = "we`ird 'col"
    df = (spark.createDataFrame([(1,), (None,)], "id int")
               .withColumnRenamed("id", weird))
    rep = {r.rule: r.violations for r in Q.validate(df, [
        Q.not_null(weird),
        Q.check("it's `quoted`", Q._c(weird).isNotNull()),
    ]).collect()}
    assert rep == {f"not_null:{weird}": 1, "check:it's `quoted`": 1}
    prof = Q.profile(df).collect()
    assert prof[0].column == weird and prof[0].n_null == 1
    empty = Q.profile(spark.createDataFrame([], "x int")).collect()[0]
    assert (empty.n_rows, empty.n_null, empty.n_distinct) == (0, 0, 0)
    assert empty.min_value is None


def test_mmr_native_id_type_and_round_sims(spark):
    """ADVICE r05: the output id column keeps the input's native type
    (string here), including on empty input; round_sims quantizes the
    cosines before the greedy recurrence (oracle-replayable contract)."""
    from pyspark.sql.types import StringType

    from pydata_vector_search_spark.operators.retrieval import mmr_rerank
    hits = spark.createDataFrame(
        [("a", [1.0, 0.0]), ("b", [0.0, 1.0]), ("c", [0.99, 0.1])],
        "doc_id string, v array<double>")
    out = mmr_rerank(hits, "doc_id", "v", [1.0, 0.5], k=3,
                     round_sims=9).orderBy("mmr_rank").collect()
    # c is most relevant; a is its near-dup, so diversity promotes b
    assert [r.doc_id for r in out] == ["c", "b", "a"]
    assert out[0].mmr_rank == 1 and isinstance(out[0].doc_id, str)
    empty = mmr_rerank(hits.limit(0), "doc_id", "v", [1.0, 0.0], k=2)
    assert isinstance(empty.schema["doc_id"].dataType, StringType)
    assert empty.count() == 0
