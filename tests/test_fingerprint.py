"""Winnowing fingerprints (operators/fingerprint.py): Spark output
equals a pure-Python reference implementation of the paper's scheme,
the shared-substring guarantee holds, fallbacks cover short/NULL text,
and the hot-fingerprint cap drops only hot fingerprints."""

import hashlib
import re

import pytest
from pyspark.sql import functions as F

from pydata_vector_search_spark.operators.fingerprint import (
    fingerprint_neardup_pairs, winnow_fingerprints)


def _py_winnow(text: str, k: int = 8, window: int = 4) -> set[int]:
    # re.ASCII: Spark (Java regex) and DuckDB (RE2) treat \s as the
    # ASCII class; Python's default \s is Unicode-aware (would collapse
    # NBSP/em-space and silently diverge from both engines)
    t = re.sub(r"\s+", " ", (text or "").lower(), flags=re.ASCII).strip()
    if len(t) >= k:
        grams = [int(hashlib.md5(t[i:i + k].encode()).hexdigest()[:8], 16)
                 for i in range(len(t) - k + 1)]
    else:
        grams = [int(hashlib.md5(t.encode()).hexdigest()[:8], 16)]
    if len(grams) >= window:
        return {min(grams[j:j + window])
                for j in range(len(grams) - window + 1)}
    return {min(grams)}


def test_winnow_matches_python_reference(spark, sf_dir):
    from pydata_vector_search_spark.catalog import read_table
    docs = read_table(spark, sf_dir, "documents").limit(50)
    got = {}
    for r in winnow_fingerprints(docs, "text", "doc_id").collect():
        got.setdefault(r.doc_id, set()).add(r.fp)
    for r in docs.select("doc_id", "text").collect():
        assert got[r.doc_id] == _py_winnow(r.text), r.doc_id
    assert got


def test_winnow_short_and_null_text(spark):
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "ab"), (4, "abcdefghij")],
        "doc_id long, text string")
    got = {}
    for r in winnow_fingerprints(df, "text", "doc_id", k=8,
                                 window=4).collect():
        got.setdefault(r.doc_id, set()).add(r.fp)
    for i in (1, 2, 3, 4):
        want = _py_winnow({1: None, 2: "", 3: "ab",
                           4: "abcdefghij"}[i])
        assert got[i] == want, i
    with pytest.raises(ValueError, match="k and window"):
        winnow_fingerprints(df, "text", "doc_id", k=0)


def test_winnow_shared_substring_guarantee(spark):
    """The paper's guarantee: a shared substring of length >= k+w-1
    yields at least one shared fingerprint."""
    shared = "the quick brown fox jumps over the lazy dog repeatedly"
    rows = [(1, "xxxx yyy " + shared + " unique tail one"),
            (2, "completely different head " + shared + " zz"),
            (3, "no overlap here at all whatsoever none")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fps = {}
    for r in winnow_fingerprints(df, "text", "doc_id", k=8,
                                 window=4).collect():
        fps.setdefault(r.doc_id, set()).add(r.fp)
    assert fps[1] & fps[2]
    pairs = {(r.id_1, r.id_2) for r in fingerprint_neardup_pairs(
        df, "text", "doc_id", k=8, window=4, min_shared=3).collect()}
    assert (1, 2) in pairs and not any(3 in p for p in pairs)


def test_winnow_hot_fp_cap(spark):
    """max_fp_df drops boilerplate fingerprints from candidate
    generation: pairs held together ONLY by a k-gram every document
    shares fall below min_shared; rarer overlaps survive."""
    boiler = "standard corporate disclaimer footer text here"
    rows = ([(i, f"unique body {i} stuff " + boiler) for i in range(10)]
            + [(100, "a very specific rare passage appears " + boiler),
               (101, "a very specific rare passage appears also")])
    df = spark.createDataFrame(rows, "doc_id long, text string")
    uncapped = {(r.id_1, r.id_2) for r in fingerprint_neardup_pairs(
        df, "text", "doc_id", k=8, window=4, min_shared=2).collect()}
    capped = {(r.id_1, r.id_2) for r in fingerprint_neardup_pairs(
        df, "text", "doc_id", k=8, window=4, min_shared=2,
        max_fp_df=3).collect()}
    assert (100, 101) in capped          # rare overlap survives the cap
    assert capped <= uncapped
    # boilerplate-only pairs (two i<10 docs) exist uncapped, die capped
    assert any(a < 100 and b < 100 for a, b in uncapped)
    assert not any(a < 100 and b < 100 for a, b in capped)


def test_winnow_unicode_parity(spark):
    """Unicode text — accents, CJK, astral-plane emoji, and REAL
    non-ASCII whitespace (NBSP/em-space) — fingerprints identically in
    Spark and the (ASCII-\\s) reference. Guards the cross-engine
    whitespace-class contract: Java regex and RE2 both treat \\s as
    ASCII, so NBSP is a regular character, NOT collapsible whitespace;
    Spark's substring/length count code points (not UTF-16 units), so
    astral-plane chars keep gram alignment."""
    texts = ["h\u00e9llo w\u00f6rld \u00fcn\u00efcode t\u00e8xt p\u00e2dding h\u00e8re",
             "\u4e2d\u6587\u6587\u672c\u53bb\u91cd\u6d4b\u8bd5 \u5185\u5bb9\u76f8\u5f53\u957f \u8db3\u591f\u4ea7\u751f\u82e5\u5e72\u514b",
             "emoji \U0001f600\U0001f600 test \U0001f389 astral chars \U0001f600 padding here",
             "nbsp\u00a0separated\u00a0tokens and em\u2003space mixed in",
             "\u03b1\u03b2\u03b3\u03b4\u03b5 \u0440\u0443\u0441\u0441\u043a\u0438\u0439 \u0442\u0435\u043a\u0441\u0442 padding"]
    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id long, text string")
    got = {}
    for r in winnow_fingerprints(df, "text", "doc_id").collect():
        got.setdefault(r.doc_id, set()).add(r.fp)
    for i, t in enumerate(texts):
        assert got[i] == _py_winnow(t), (i, t[:30])


def test_winnow_clusters_composition(spark):
    """Fingerprint pairs compose with connected_components exactly like
    the other near-dup families (the r09 `winnow` dedup_clusters
    path): replica groups collapse to one min-id component each."""
    from pydata_vector_search_spark.operators.graph import \
        connected_components
    base = ["the quick brown fox jumps over the lazy dog again",
            "pack my box with five dozen liquor jugs tonight ok",
            "sphinx of black quartz judge my vow completely done"]
    rows = [(10 * b + i, t + ("" if i == 0 else f" v{i}"))
            for b, t in enumerate(base) for i in range(3)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = fingerprint_neardup_pairs(df, "text", "doc_id",
                                      k=8, window=4, min_shared=5)
    cc = connected_components(pairs, src="id_1", dst="id_2")
    comp = {r.node: r.component for r in cc.collect()}
    for b in range(3):
        members = [10 * b + i for i in range(3) if 10 * b + i in comp]
        assert members, b
        assert len({comp[m] for m in members}) == 1
        assert comp[members[0]] == min(members)
    # no cross-base merges
    assert len({comp[m] for m in comp}) == 3


def test_winnow_fanout_single_exchange(spark):
    """r13 fan-out invariant: the fingerprint pipeline's physical plan
    carries exactly ONE shuffle below the sliding-min window — the id
    fan-out repartition whose hash layout the window reuses (a second
    Exchange appearing between the Generate and the Window would mean
    the gram explode went back to input-file parallelism or the window
    stopped riding the fan-out layout)."""
    df = spark.createDataFrame(
        [(i, f"document number {i} with some shared text body")
         for i in range(100)], "doc_id long, text string")
    plan = (winnow_fingerprints(df, "text", "doc_id", k=8, window=4)
            ._jdf.queryExecution().executedPlan().toString())
    # strip the AQE header; count shuffle exchanges in the whole plan
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 1, plan
    assert "Window" in plan and "Generate" in plan, plan
