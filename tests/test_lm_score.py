"""Bigram-LM perplexity scoring + DSIR importance weights (lm_score.py)."""

import math

import pytest
from pyspark.sql import functions as F

from pydata_vector_search_spark.catalog import read_table
from pydata_vector_search_spark.operators.lm_score import (
    _SCALE, bigram_lm_score, dsir_importance)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return read_table(spark, sf_dir, "documents").cache()


def _py_bigram_nll(rows, lam=0.8):
    """Pure-Python reference: interpolated unigram/bigram NLL in
    integer micro-nats, mirroring the operator's floor convention."""
    toks = {i: t.lower().split() for i, t in rows}
    uni, bi = {}, {}
    n = 0
    for ts in toks.values():
        for w in ts:
            uni[w] = uni.get(w, 0) + 1
            n += 1
        for a, b in zip(ts, ts[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
    out = {}
    for i, ts in toks.items():
        if len(ts) < 2:
            continue
        s = 0
        for a, b in zip(ts, ts[1:]):
            p = lam * bi[(a, b)] / uni[a] + (1.0 - lam) * uni[b] / n
            s += math.floor(-math.log(p) * _SCALE + 0.5)
        out[i] = (len(ts) - 1, s)
    return out


def test_bigram_lm_matches_python_reference(spark):
    rows = [(1, "the cat sat on the mat"),
            (2, "the cat sat on the cat"),
            (3, "a dog barked"),
            (4, "solo")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.n_bigrams, r.nll_micro)
           for r in bigram_lm_score(df, "text", "doc_id").collect()}
    assert got == _py_bigram_nll(rows)


def test_bigram_lm_repeated_doc_scores_lower(spark):
    """A doc following the corpus's dominant bigram pattern scores lower
    NLL than a doc using the same vocabulary in an unusual order (note:
    a doc of fully UNIQUE bigrams would score p(w2|w1)=1 under a
    self-trained model — the discriminating case is common words in
    rare contexts, which is also the realistic gibberish shape)."""
    rows = [(i, "alpha beta alpha beta alpha beta") for i in range(5)]
    rows += [(99, "beta beta beta beta")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.nll_micro / r.n_bigrams
           for r in bigram_lm_score(df, "text", "doc_id").collect()}
    assert got[0] < got[99]


def test_bigram_lm_partition_invariant(docs):
    a = bigram_lm_score(docs.repartition(13), "text", "doc_id")
    b = bigram_lm_score(docs.coalesce(1), "text", "doc_id")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_dsir_prefers_target_like_docs(spark):
    """Docs sharing the target's bigrams out-weigh docs that don't."""
    target = spark.createDataFrame(
        [(100 + i, "spark shuffle join broadcast") for i in range(4)],
        "doc_id long, text string")
    raw = spark.createDataFrame(
        [(1, "spark shuffle join broadcast"),
         (2, "turnip casserole recipe book"),
         (3, "spark shuffle turnip book")],
        "doc_id long, text string")
    out = dsir_importance(raw, target, "text", "doc_id").collect()
    order = [r.doc_id for r in out]
    assert order[0] == 1 and order[-1] == 2
    w = {r.doc_id: r.w_micro for r in out}
    assert w[1] > w[3] > w[2]


def test_dsir_weights_are_exact_longs_and_k_truncates(docs):
    target = docs.filter(F.col("lang") == "en")
    out = dsir_importance(docs, target, "text", "doc_id", k=7)
    rows = out.collect()
    assert len(rows) == 7
    assert all(isinstance(r.w_micro, int) for r in rows)
    # deterministic ordering: (w desc, id asc)
    key = [(-r.w_micro, r.doc_id) for r in rows]
    assert key == sorted(key)


def test_dsir_partition_invariant(docs):
    target = docs.filter(F.col("lang") == "en")
    a = dsir_importance(docs.repartition(11), target, "text", "doc_id")
    b = dsir_importance(docs.coalesce(1), target, "text", "doc_id")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_dsir_plan_broadcasts_models_no_corpus_shuffle(docs):
    """The scale contract: bucket models are broadcast; the raw-corpus
    explode reaches the per-doc aggregate without an intermediate
    shuffle — the only hash exchanges are the (tiny) model-building
    aggregates and the final per-doc partial/final agg pair."""
    target = docs.filter(F.col("lang") == "en")
    out = dsir_importance(docs, target, "text", "doc_id", k=10)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in plan
    # the occurrence->model join must be a broadcast join, never a
    # sort-merge (which would shuffle the corpus explode)
    assert "SortMergeJoin" not in plan


def test_dsir_empty_target_raises(spark, docs):
    with pytest.raises(ValueError, match="no bigrams"):
        dsir_importance(docs, docs.filter(F.lit(False)), "text", "doc_id")


def test_bigram_lm_max_vocab_collision_free_equals_uncapped(spark):
    """With a bucket space vastly larger than the vocabulary the hash
    bucketing is (whp, and deterministically for this fixed corpus) a
    bijective relabeling — every count, probability, and floored
    micro-nat is identical to the uncapped model."""
    rows = [(1, "the cat sat on the mat"),
            (2, "the cat sat on the cat"),
            (3, "a dog barked at the cat"),
            (4, "a dog sat")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    base = {r.doc_id: (r.n_bigrams, r.nll_micro)
            for r in bigram_lm_score(df, "text", "doc_id").collect()}
    capped = {r.doc_id: (r.n_bigrams, r.nll_micro)
              for r in bigram_lm_score(df, "text", "doc_id",
                                       max_vocab=1 << 30).collect()}
    assert base == capped


def test_bigram_lm_max_vocab_one_bucket_analytic(spark):
    """max_vocab=1 collapses every token into one symbol: every bigram
    has identical probability lam*B/N + (1-lam), so nll_micro must be
    exactly n_bigrams * floor(-ln(p)*1e6 + 0.5) — the count tables are
    one row each (the provable bound, at its degenerate extreme)."""
    rows = [(1, "u v w x"), (2, "y z u"), (3, "p q")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    n_tok, n_bi = 9, 6            # 4+3+2 tokens; 3+2+1 bigrams
    p = 0.8 * n_bi / n_tok + 0.2 * n_tok / n_tok
    q = math.floor(-math.log(p) * _SCALE + 0.5)
    got = {r.doc_id: (r.n_bigrams, r.nll_micro)
           for r in bigram_lm_score(df, "text", "doc_id",
                                    max_vocab=1).collect()}
    assert got == {1: (3, 3 * q), 2: (2, 2 * q), 3: (1, 1 * q)}


def test_bigram_lm_max_vocab_bounds_model_and_stays_invariant(docs):
    """A small cap over the real corpus: result is deterministic under
    re-partitioning, and the training table row counts respect the cap
    (unigram <= max_vocab, bigram <= max_vocab^2)."""
    df = docs.select("doc_id", "text")
    a = sorted(map(tuple, bigram_lm_score(df, "text", "doc_id",
                                          max_vocab=16).collect()))
    b = sorted(map(tuple, bigram_lm_score(df.repartition(13), "text",
                                          "doc_id", max_vocab=16).collect()))
    assert a == b and len(a) > 0
    # recompute the bucketed vocab exactly as the operator does
    from pydata_vector_search_spark.operators.dedup import tokens_col
    from pydata_vector_search_spark.operators.lm_score import _vocab_bucket
    n_uni = (df.select(F.explode(tokens_col("text")).alias("t"))
               .select((_vocab_bucket(F.col("t")) % 16).alias("b"))
               .distinct().count())
    assert n_uni <= 16


def test_bigram_lm_max_vocab_invalid_raises(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="max_vocab"):
        bigram_lm_score(df, "text", "doc_id", max_vocab=0)


def test_bigram_lm_null_empty_and_whitespace_corpus_corners(spark):
    """The r12 n_total refactor (derive the token total from the unigram
    table instead of a second corpus sizes-sum pass) must hold on the
    corners where the two spellings could diverge: NULL text (NULL token
    array — dropped by explode, skipped by sum-of-sizes), empty text,
    and whitespace-only text. Scores must equal the pure-Python
    reference computed over the tokens the operator actually sees."""
    rows = [(1, "the cat sat on the mat"),
            (2, None),
            (3, ""),
            (4, "   "),
            (5, "the cat sat on the cat"),
            (6, "solo")]                      # < 2 tokens: no bigrams
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.n_bigrams, r.nll_micro)
           for r in bigram_lm_score(df, "text", "doc_id").collect()}
    # mirror tokens_col exactly: NULL text -> no tokens (explode of a
    # NULL array); empty/whitespace text normalizes to "" and splits to
    # [""] — ONE empty-string token that counts toward the unigram
    # model and the token total in BOTH the pre-r12 sizes-sum and the
    # r12 unigram-sum spellings (verified equal against the old
    # operator on this exact corpus)
    import re

    def _tokens(t):
        return re.sub(r"\s+", " ", t.lower()).strip().split(" ")

    uni, n = {}, 0
    toks = {i: _tokens(t) for i, t in rows if t is not None}
    for ts in toks.values():
        for w in ts:
            uni[w] = uni.get(w, 0) + 1
            n += 1
    ref = {}
    for i, ts in toks.items():
        if len(ts) < 2:
            continue
        s = 0
        for a, b in zip(ts, ts[1:]):
            bc = sum(1 for ots in toks.values()
                     for x, y in zip(ots, ots[1:]) if (x, y) == (a, b))
            p = 0.8 * bc / uni[a] + 0.2 * uni[b] / n
            s += math.floor(-math.log(p) * _SCALE + 0.5)
        ref[i] = (len(ts) - 1, s)
    assert got == ref
