"""Sub-document dedup: paragraph-level and substring-span (Lee et al. '21)."""

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from pydata_vector_search_spark.catalog import read_table
from pydata_vector_search_spark.operators.span_dedup import (
    duplicate_span_dedup, paragraph_dedup)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return read_table(spark, sf_dir, "documents").cache()


# --------------------------------------------------------------------------
# paragraph_dedup
# --------------------------------------------------------------------------

def _pd_rows(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r.doc_id: r for r in
            paragraph_dedup(df, "text", "doc_id", **kw).collect()}


def test_paragraph_first_occurrence_kept(spark):
    out = _pd_rows(spark, [
        (1, "aaa\nshared"), (2, "shared\nbbb"), (3, "shared")])
    assert out[1].text == "aaa\nshared"
    assert out[2].text == "bbb"
    assert out[3].text == "" and out[3].n_kept == 0
    assert [out[i].n_units for i in (1, 2, 3)] == [2, 2, 1]


def test_paragraph_within_doc_repeat_removed(spark):
    out = _pd_rows(spark, [(7, "x\ny\nx\nx")])
    assert out[7].text == "x\ny" and out[7].n_kept == 2


def test_paragraph_min_chars_guard(spark):
    # units under min_chars are never candidates: both empties survive
    out = _pd_rows(spark, [(1, "aa\n\nbb"), (2, "\ncc")], min_chars=1)
    assert out[1].text == "aa\n\nbb"
    assert out[2].text == "\ncc"


def test_paragraph_order_preserved_and_partition_invariant(docs):
    """Result is independent of input partitioning (keep rule is a
    global min, not first-seen)."""
    lines = F.array_join(
        F.transform(F.sequence(F.lit(0), F.lit(4)),
                    lambda i: F.array_join(
                        F.slice(F.split("text", " "), i * 8 + 1, 8), " ")),
        "\n")
    d = docs.select("doc_id", lines.alias("text"))
    a = paragraph_dedup(d.repartition(13), "text", "doc_id")
    b = paragraph_dedup(d.coalesce(1), "text", "doc_id")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


# --------------------------------------------------------------------------
# duplicate_span_dedup
# --------------------------------------------------------------------------

def _sd_rows(spark, rows, n):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r.doc_id: r for r in
            duplicate_span_dedup(df, "text", "doc_id", n=n).collect()}


def test_span_union_of_overlapping_windows(spark):
    """A duplicated run of length L >= n is removed as ONE maximal span."""
    out = _sd_rows(spark, [
        (1, "a b c d e f g h i j"),
        (2, "x y a b c d e f q r")], n=4)
    assert out[1].text == "a b c d e f g h i j"     # first occurrence intact
    assert out[2].text == "x y q r"
    assert out[2].n_removed == 6 and out[2].n_spans == 1


def test_span_whole_doc_removed(spark):
    out = _sd_rows(spark, [(1, "a b c d e"), (2, "a b c d e")], n=5)
    assert out[2].text == "" and out[2].n_removed == 5


def test_span_short_doc_untouched(spark):
    out = _sd_rows(spark, [(1, "p q r"), (2, "p q r")], n=4)
    assert out[1].text == "p q r" and out[2].text == "p q r"


def test_span_within_doc_repeat(spark):
    out = _sd_rows(spark, [(1, "a b c z a b c")], n=3)
    assert out[1].text == "a b c z"
    assert out[1].n_removed == 3 and out[1].n_spans == 1


def test_span_disjoint_spans_counted(spark):
    out = _sd_rows(spark, [
        (1, "a b c m n o"),
        (2, "a b c XX YY m n o")], n=3)
    assert out[2].text == "xx yy"       # normalized_text lowercases
    assert out[2].n_spans == 2 and out[2].n_removed == 6


def _ref_span_dedup(rows, n):
    """Pure-Python reference for duplicate_span_dedup semantics."""
    toks = {i: t.split(" ") for i, t in rows}
    first = {}
    for d in sorted(toks):
        ts = toks[d]
        for p in range(len(ts) - n + 1):
            first.setdefault(tuple(ts[p:p + n]), (d, p))
    out = {}
    for d in sorted(toks):
        ts = toks[d]
        starts = [p for p in range(len(ts) - n + 1)
                  if first[tuple(ts[p:p + n])] != (d, p)]
        spans = []
        for p in starts:
            if spans and p <= spans[-1][1]:
                spans[-1][1] = max(spans[-1][1], p + n)
            else:
                spans.append([p, p + n])
        covered = {i for s, e in spans for i in range(s, e)}
        kept = [t for i, t in enumerate(ts) if i not in covered]
        out[d] = (" ".join(kept), len(ts),
                  sum(e - s for s, e in spans), len(spans))
    return out


@settings(max_examples=10, deadline=None)
@given(st.integers(2, 4),
       st.lists(st.lists(st.sampled_from("abc"), min_size=1, max_size=10),
                min_size=2, max_size=6))
def test_span_matches_python_reference(spark, n, token_lists):
    """Random tiny corpora over a 3-token alphabet (dense gram
    collisions) agree with the pure-Python reference exactly."""
    rows = [(i, " ".join(ts)) for i, ts in enumerate(token_lists)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.text, r.n_tokens, r.n_removed, r.n_spans)
           for r in duplicate_span_dedup(df, "text", "doc_id", n=n).collect()}
    assert got == _ref_span_dedup(rows, n)


def test_span_partition_invariant_on_corpus(docs):
    d = docs.select("doc_id", "text")
    a = duplicate_span_dedup(d.repartition(13), "text", "doc_id", n=8)
    b = duplicate_span_dedup(d.coalesce(1), "text", "doc_id", n=8)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_span_token_conservation(docs):
    """n_tokens == n_removed + surviving token count, per doc."""
    out = duplicate_span_dedup(docs, "text", "doc_id", n=8)
    # degenerate guard: an empty input doc tokenizes to [''] (1 token)
    # but its rebuilt text splits back to 0 — exclude that shape
    bad = out.filter(
        ~((F.col("text") == "") & (F.col("n_removed") == 0)) &
        (F.size(F.filter(F.split("text", " "),
                         lambda t: F.length(t) > 0)) + F.col("n_removed")
         != F.col("n_tokens"))).count()
    assert bad == 0


def _ref_paragraph_dedup(rows, min_chars=1):
    """Pure-Python reference for paragraph_dedup semantics."""
    first = {}
    for d, t in sorted(rows):
        for p, u in enumerate(t.split("\n")):
            if len(u) >= min_chars:
                first.setdefault(u, (d, p))
    out = {}
    for d, t in sorted(rows):
        units = t.split("\n")
        kept = [u for p, u in enumerate(units)
                if len(u) < min_chars or first[u] == (d, p)]
        out[d] = ("\n".join(kept), len(units), len(kept))
    return out


@settings(max_examples=10, deadline=None)
@given(st.lists(
    st.lists(st.sampled_from(["aa", "bb", "cc", ""]), min_size=1,
             max_size=6).map("\n".join),
    min_size=2, max_size=6))
def test_paragraph_matches_python_reference(spark, texts):
    """Random tiny corpora over a 3-paragraph alphabet (+ empty lines,
    which min_chars=1 always keeps) agree with the pure-Python
    reference exactly."""
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.text, r.n_units, r.n_kept)
           for r in paragraph_dedup(df, "text", "doc_id").collect()}
    assert got == _ref_paragraph_dedup(rows)


def test_null_text_treated_as_empty(spark):
    """NULL text must not drop the document or poison stats with NULLs."""
    df = spark.createDataFrame([(1, "aa\nbb"), (2, None)],
                               "doc_id long, text string")
    p = {r.doc_id: r for r in paragraph_dedup(df, "text", "doc_id").collect()}
    assert p[2].text == "" and p[2].n_units == 1 and p[2].n_kept == 1
    s = {r.doc_id: r
         for r in duplicate_span_dedup(df, "text", "doc_id", n=2).collect()}
    assert s[2].text == "" and s[2].n_removed == 0 and s[2].n_spans == 0


def test_pack_id_out_of_range_raises(spark):
    """The (doc,pos) long-packing guards BOTH preconditions (ADVICE r06):
    an id >= 2^41 (e.g. a 64-bit hash id) or a negative id raises
    instead of silently wrapping the packed long and corrupting the
    first-occurrence min."""
    import pytest

    # match on the MESSAGE, not the class: when AQE materializes two
    # failing stages concurrently, the SparkRuntimeExceptions arrive
    # wrapped in a STAGE_MATERIALIZATION_MULTIPLE_FAILURES
    # SparkException — the raise itself is identical either way
    for bad_id in (1 << 41, 1 << 60, -1):
        df = spark.createDataFrame([(bad_id, "aa\naa"), (7, "aa\nbb")],
                                   "doc_id long, text string")
        with pytest.raises(Exception, match="cannot pack"):
            paragraph_dedup(df, "text", "doc_id").collect()
    # boundary: 2^41 - 1 still packs fine
    ok = spark.createDataFrame([((1 << 41) - 1, "aa\nbb")],
                               "doc_id long, text string")
    assert paragraph_dedup(ok, "text", "doc_id").count() == 1
