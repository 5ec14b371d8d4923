"""Invariant tests for the r06-late composition queries (oracle-checked
at three SFs; these pin the semantic invariants against refactors)."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def entry():
    import __spark_entry__ as e
    return e


def test_clean_pipeline_invariants(spark, sf_dir, entry):
    out = {r.lang: r for r in
           entry.queries()["clean_pipeline"](spark, sf_dir).collect()}
    raw = {r.lang: r.n for r in
           spark.read.parquet(f"{sf_dir}/documents.parquet")
                .groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
                .collect()}
    for lang, row in out.items():
        assert 0 < row.n_docs <= raw[lang]          # gate only removes
        assert 0 <= row.kept <= row.units           # dedup only removes
        # every kept 10-token line contributes <= 10 tokens
        assert row.kept_tokens <= 10 * row.kept


def test_hard_negatives_invariants(spark, sf_dir, entry):
    rows = entry.queries()["hard_negatives"](spark, sf_dir).collect()
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    labels = {r.vec_id: r.label for r in
              emb.select("vec_id", "label").collect()}
    assert {r.qid for r in rows} == {0, 1, 2, 3, 4}
    per_q = {}
    for r in rows:
        assert labels[r.neg_id] != labels[r.qid]    # negatives only
        assert 0.0 <= r.dist <= 2.0
        per_q.setdefault(r.qid, []).append(r.neg_id)
    assert all(len(v) == 3 for v in per_q.values())
    # declared ordering is (qid, neg_id)
    assert [(r.qid, r.neg_id) for r in rows] == sorted(
        (r.qid, r.neg_id) for r in rows)
    # exact top-3 membership is oracle-pinned at three SFs
