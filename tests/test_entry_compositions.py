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

def test_dataloader_epoch_invariants(spark, sf_dir, entry):
    rows = entry.queries()["dataloader_epoch"](spark, sf_dir).collect()
    assert 1 <= len(rows) <= 4                      # <= num_shards
    assert [r.shard for r in rows] == sorted(r.shard for r in rows)
    # the budget stage caps total kept tokens; packing conserves them
    total = sum(r.shard_tokens for r in rows)
    assert 0 < total <= 8000
    # bins partition the shard space: counts and checksums are positive,
    # first/last bins are members of the shard's permutation
    for r in rows:
        assert r.n_bins >= 1 and r.ord_sum >= r.first_bin
    # deterministic end-to-end (fresh lineage, same result)
    again = entry.queries()["dataloader_epoch"](spark, sf_dir).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_stream_index_patch_invariants(spark, sf_dir, entry):
    rows = entry.queries()["stream_index_patch"](spark, sf_dir).collect()
    assert len(rows) == 10
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    labels = {r.vec_id: r.label for r in
              emb.select("vec_id", "label").collect()}
    for r in rows:
        # streamed mutation visible through the patched index: every
        # % 10 == 0 key serves the streamed label, others the original
        if r.vec_id % 10 == 0:
            assert r.label == 99
        else:
            assert r.label == labels[r.vec_id]
        assert -1.0 <= r.score <= 1.0
    # scores descend (distance ascends) with vec_id tiebreak
    key = [(-r.score, r.vec_id) for r in rows]
    assert key == sorted(key)
    # vec_id 0's vector was negated, so the self-match cannot lead
    assert rows[0].vec_id != 0
