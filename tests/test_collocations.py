"""PMI collocations (operators/collocations): DuckDB bit-exact replay
on real testdata, pure-Python reference on a constructed corpus, guards."""

import math

import duckdb
import pytest

from pydata_vector_search_spark.catalog import read_table
from pydata_vector_search_spark.operators.collocations import \
    collocations_pmi

SF = "/root/testdata/sf0.01"

# the oracle SQL lives in tools/collocations_oracle_draft.py (the
# r11 declaration draft) — imported so test and draft cannot diverge
from tools.collocations_oracle_draft import \
    build_collocations_oracle_sql  # noqa: E402


def test_pmi_matches_duckdb_on_testdata(spark):
    got = [tuple(r) for r in
           collocations_pmi(read_table(spark, SF, "documents"), "text",
                            min_count=5, top_k=30).collect()]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    want = [tuple(r) for r in
            con.execute(build_collocations_oracle_sql(5, 30)).fetchall()]
    assert got == want and len(got) == 30


def test_pmi_python_reference(spark):
    corpus = ["the big dog", "the big dog", "a big dog", "the small cat",
              "big dog runs", "the big idea"]
    df = spark.createDataFrame([(t,) for t in corpus], "text string")
    got = [tuple(r) for r in
           collocations_pmi(df, "text", min_count=2, top_k=10).collect()]

    bc: dict = {}
    for t in corpus:
        w = t.split()
        for a, b in zip(w, w[1:]):
            bc[(a, b)] = bc.get((a, b), 0) + 1
    n = sum(bc.values())
    cl: dict = {}
    cr: dict = {}
    for (a, b), c in bc.items():
        cl[a] = cl.get(a, 0) + c
        cr[b] = cr.get(b, 0) + c
    want = []
    for (a, b), c in bc.items():
        if c >= 2:
            pmi = math.floor(
                math.log((float(c) * float(n)) / (float(cl[a]) * cr[b]))
                * 1_000_000 + 0.5)
            want.append((a, b, c, pmi))
    want.sort(key=lambda r: (-r[3], -r[2], r[0], r[1]))
    assert got == want[:10] and got


def test_pmi_rare_pairs_count_toward_marginals(spark):
    # 'x y' appears once (filtered from output) but its mass must still
    # be inside N and the marginals of x / y
    df = spark.createDataFrame(
        [("x y",), ("x z",), ("x z",)], "text string")
    got = {(r.w1, r.w2): (r.pair_count, r.pmi_micro) for r in
           collocations_pmi(df, "text", min_count=2, top_k=5).collect()}
    assert set(got) == {("x", "z")}
    c, n, cl, cr = 2, 3, 3, 2
    assert got[("x", "z")] == (
        2, math.floor(math.log((float(c) * n) / (float(cl) * cr))
                      * 1_000_000 + 0.5))


def test_pmi_empty_and_guards(spark):
    empty = spark.createDataFrame([], "text string")
    assert collocations_pmi(empty, "text").count() == 0
    one = spark.createDataFrame([("hello",)], "text string")
    assert collocations_pmi(one, "text").count() == 0  # no bigrams
    with pytest.raises(ValueError, match="min_count"):
        collocations_pmi(one, "text", min_count=0)
    with pytest.raises(ValueError, match="top_k"):
        collocations_pmi(one, "text", top_k=0)
