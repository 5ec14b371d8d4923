"""Naive Bayes classifier (operators/classify.py): exact parity with a
pure-Python reference implementation (same floored micro-nat integer
partials), unseen-token and empty-doc handling, the max_vocab bucket
path, and self-classification sanity on the fixture corpus."""

import math
import re

import pytest
from pyspark.sql import functions as F

from pydata_vector_search_spark.operators.classify import nb_score, nb_train


def _norm_tokens(text):
    t = re.sub(r"\s+", " ", (text or "").lower()).strip()
    return [w for w in t.split(" ") if w]


def _py_nb(train, score, a=1.0):
    """train/score: list[(id, text, label)] / list[(id, text)] →
    {id: (pred_label, score_micro)} with floor(ln(p)*1e6+0.5) longs."""
    mk = lambda p: math.floor(math.log(p) * 1e6 + 0.5)  # noqa: E731
    counts, per_class, docs = {}, {}, {}
    vocab = set()
    for _id, text, y in train:
        docs[y] = docs.get(y, 0) + 1
        for w in _norm_tokens(text):
            vocab.add(w)
            counts[(y, w)] = counts.get((y, w), 0) + 1
            per_class[y] = per_class.get(y, 0) + 1
    v, n = len(vocab), len(train)
    out = {}
    for _id, text in score:
        best = None
        for y in docs:
            nt = per_class.get(y, 0)
            s = mk(docs[y] / n)
            for w in _norm_tokens(text):
                if w in vocab:
                    s += mk((counts.get((y, w), 0) + a) / (nt + a * v))
                else:
                    s += mk(a / (nt + a * v))
            if best is None or (s, y) > best:
                best = (s, y)
        out[_id] = (best[1], best[0])
    return out


def test_nb_matches_python_reference(spark):
    train = [(1, "spark shuffles data between stages", "tech"),
             (2, "catalyst optimizes the logical plan", "tech"),
             (3, "the cat sat on the warm mat", "pets"),
             (4, "dogs chase the cat around", "pets"),
             (5, "parquet files store columns", "tech")]
    score = [(10, "the plan shuffles columns"),
             (11, "the cat and dogs nap"),          # pets words
             (12, "zebras graze quietly"),          # all unseen
             (13, "")]                              # empty doc
    tdf = spark.createDataFrame(train, "doc_id long, text string, y string")
    sdf = spark.createDataFrame(score, "doc_id long, text string")
    model = nb_train(tdf, "text", "y")
    got = {r.doc_id: (r.pred_label, r.score_micro) for r in
           nb_score(sdf, model, "text", "doc_id").collect()}
    want = _py_nb(train, score)
    assert got == want
    assert got[10][0] == "tech" and got[11][0] == "pets"


def test_nb_max_vocab_bucket_path(spark):
    """Collision-free bucketing relabels tokens bijectively — scores
    must be bit-identical to uncapped; the dense table is bounded."""
    rows = [(i, f"tok{i % 7} tok{(i + 1) % 7} filler", "a" if i % 2 else "b")
            for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string, y string")
    uncapped = nb_train(df, "text", "y")
    capped = nb_train(df, "text", "y", max_vocab=1 << 20)
    su = {r.doc_id: (r.pred_label, r.score_micro) for r in
          nb_score(df, uncapped, "text", "doc_id").collect()}
    sc = {r.doc_id: (r.pred_label, r.score_micro) for r in
          nb_score(df, capped, "text", "doc_id").collect()}
    assert su == sc
    small = nb_train(df, "text", "y", max_vocab=4)
    assert small.dense.count() <= 4 * 2       # <= max_vocab * |labels|
    preds = nb_score(df, small, "text", "doc_id")
    assert preds.count() == 30                # still scores everything


def test_nb_guards(spark):
    df = spark.createDataFrame([(1, "x", "a")],
                               "doc_id long, text string, y string")
    with pytest.raises(ValueError, match="smoothing"):
        nb_train(df, "text", "y", smoothing=0)
    with pytest.raises(ValueError, match="max_vocab"):
        nb_train(df, "text", "y", max_vocab=0)


def test_nb_separable_corpus_accuracy(spark):
    """On a class-separable corpus (distinct vocabularies + shared
    filler, 20% filler-only noise docs), self-classification recovers
    nearly every labeled doc — the smoke any quality-classifier
    pipeline expects. (The sf fixture's lang column is NOT text-
    correlated — synthetic shared vocabulary — so the smoke runs on a
    corpus where the signal exists.)"""
    import random
    rng = random.Random(7)
    vocab = {"code": ["def", "return", "import", "class", "lambda"],
             "news": ["election", "minister", "economy", "report"],
             "chat": ["lol", "haha", "omg", "brb"]}
    filler = ["the", "a", "and", "of", "to"]
    rows = []
    for i in range(300):
        y = ["code", "news", "chat"][i % 3]
        words = [rng.choice(vocab[y] if rng.random() < 0.6 else filler)
                 for _ in range(20)]
        rows.append((i, " ".join(words), y))
    df = spark.createDataFrame(rows, "doc_id long, text string, y string")
    model = nb_train(df, "text", "y")
    scored = nb_score(df, model, "text", "doc_id").join(df, "doc_id")
    n = scored.count()
    hit = scored.filter(F.col("pred_label") == F.col("y")).count()
    assert n == 300 and hit / n >= 0.95, (hit, n)


def test_nb_broadcast_gate_same_results(spark):
    """nb_score broadcasts the dense model only while the trained |V|
    is provably small (NBModel.vocab_size, recorded eagerly at train
    time); past BROADCAST_SAFE_VOCAB it degrades to a shuffle join —
    identical predictions, no unbounded broadcast (r08 ADVICE)."""
    import dataclasses

    from pydata_vector_search_spark.operators import classify as C

    rows = [(i, f"tok{i % 7} common word", ["a", "b"][i % 2])
            for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string, y string")
    model = nb_train(df, "text", "y")
    assert 0 < model.vocab_size <= C.BROADCAST_SAFE_VOCAB
    small = nb_score(df, model, "text", "doc_id")
    # force the over-bound path: same tables, vocab_size past the gate
    big = nb_score(df, dataclasses.replace(
        model, vocab_size=C.BROADCAST_SAFE_VOCAB + 1), "text", "doc_id")
    assert sorted(map(tuple, small.collect())) == \
        sorted(map(tuple, big.collect()))


def test_nb_unpersist_recomputes_identically(spark):
    """NBModel.unpersist releases the cached training-count table; the
    model's dense lineage must then recompute from the corpus and score
    identically (the persist is a latency optimization, never a
    semantic dependency)."""
    rows = [(i, f"tok{i % 5} shared term", ["x", "y"][i % 2])
            for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string, y string")
    model = nb_train(df, "text", "y", max_vocab=64)
    before = sorted(map(tuple,
                        nb_score(df, model, "text", "doc_id").collect()))
    model.unpersist()
    after = sorted(map(tuple,
                       nb_score(df, model, "text", "doc_id").collect()))
    assert before == after
    model.unpersist()          # idempotent on an already-released model
