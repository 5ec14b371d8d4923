"""Full curation chain (operators/curation.curate_corpus): DuckDB
parity on real testdata via the r12-staged draft oracle, stage
semantics, and the distributed-cap equality."""

import duckdb

from pydata_vector_search_spark.catalog import read_table
from pydata_vector_search_spark.operators.curation import curate_corpus

SF = "/root/testdata/sf0.01"


def _ids(df):
    return sorted(r.doc_id for r in df.select("doc_id").collect())


def test_chain_matches_draft_oracle(spark):
    # imports the r12-staged oracle builder, so the test and the
    # staged declaration can never diverge (the collocations pattern)
    from tools.curation_chain_oracle_draft import \
        build_curation_chain_oracle_sql
    docs = read_table(spark, SF, "documents")
    got = _ids(curate_corpus(docs, "text", "doc_id", "source"))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    want = sorted(r[0] for r in
                  con.execute(build_curation_chain_oracle_sql()).fetchall())
    assert got == want and 0 < len(got)


def test_distributed_cap_stage_identical(spark):
    docs = read_table(spark, SF, "documents")
    default = _ids(curate_corpus(docs, "text", "doc_id", "source"))
    dist = _ids(curate_corpus(docs, "text", "doc_id", "source",
                              distributed=True))
    assert default == dist


def test_null_text_and_domain_flow(spark):
    # Pins the NULL semantics the chain inherits: NULL texts all share
    # the NULL fingerprint, so dedup keeps exactly ONE (min id) across
    # the corpus; quality_score(NULL) is 0.55 in BOTH engines (Spark
    # and DuckDB least() ignore NULLs: 0.4*1.0 + 0.3*0.5 + 0.3*0.0),
    # so the survivor passes a 0.5 gate and dies at a 0.6 gate. NULL
    # domains form their own cap group (the r11 NULL-safe distributed
    # joins included).
    good = ("solid informative sentence with plenty of words and "
            "reasonable structure here") * 3
    rows = [(1, good + " one", None), (2, None, None),
            (3, good + " three", "a"), (4, None, "a")]
    df = spark.createDataFrame(rows, "doc_id long, text string, src string")
    for dist in (False, True):
        kept = _ids(curate_corpus(df, "text", "doc_id", "src",
                                  cap_tokens=10_000, min_quality=0.5,
                                  budget_tokens=10_000,
                                  distributed=dist))
        assert kept == [1, 2, 3], dist     # 4 = NULL-fp dup of 2
        strict = _ids(curate_corpus(df, "text", "doc_id", "src",
                                    cap_tokens=10_000, min_quality=0.6,
                                    budget_tokens=10_000,
                                    distributed=dist))
        assert strict == [1, 3], dist      # higher gate kills NULL text


def test_null_corpus_matches_oracle(spark):
    # the synthetic NULL corpus above, hash-compared against the
    # staged DuckDB oracle itself (both gates) — cross-engine proof of
    # the NULL semantics, not just Spark-internal consistency
    import pandas as pd

    from tools.curation_chain_oracle_draft import (
        build_curation_chain_oracle_sql, curation_chain)
    good = ("solid informative sentence with plenty of words and "
            "reasonable structure here") * 3
    rows = [(1, good + " one", "en", None), (2, None, "en", None),
            (3, good + " three", "de", "a"), (4, None, "de", "a")]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string")
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source"]))
    for mq in (0.5, 0.6):
        got = [tuple(r) for r in
               curation_chain(df, cap_tokens=10_000, min_quality=mq,
                              budget_tokens=10_000).collect()]
        want = [tuple(r) for r in con.execute(
            build_curation_chain_oracle_sql(10_000, mq,
                                            10_000)).fetchall()]
        assert got == want, mq


def test_null_text_in_budget_boundary_bucket(spark):
    # r12 ADVICE-medium repro: a NULL-text survivor (quality 0.55)
    # holding the MIN id inside the budget stage's boundary bucket.
    # Its running token sum is NULL (sum skips NULL, nothing non-NULL
    # precedes it in the bucket or above), and `NULL <= budget` keeps
    # nothing — BOTH engines must drop it. The old draft oracle fed the
    # budget stage a coalesce(nt, 0), kept doc 1, and would have broken
    # the r12 declaration's cross-engine hash on such corpora.
    import pandas as pd

    from tools.curation_chain_oracle_draft import (
        build_curation_chain_oracle_sql, curation_chain)

    # crafted quality EXACTLY 0.55 (the NULL-text score): len 50 ->
    # 0.4*0.25; avg word len 2 (outside [3,12]) -> 0.3*0.5; zero
    # punctuation -> 0.3*1.0 == 0.1 + 0.15 + 0.3. Same 3-dp budget
    # bucket as the NULL doc in both engines (verbatim-replayed arith).
    def t(tail):
        return "a " * 24 + tail                    # 50 chars, 25 tokens
    rows = [(1, None, "en", "s"), (2, t("ab"), "en", "s"),
            (3, t("ac"), "en", "s"), (4, t("ad"), "en", "s")]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string")
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source"]))
    got = [tuple(r) for r in
           curation_chain(df, cap_tokens=10_000, min_quality=0.5,
                          budget_tokens=30).collect()]
    want = [tuple(r) for r in con.execute(
        build_curation_chain_oracle_sql(10_000, 0.5, 30)).fetchall()]
    # budget 30 admits exactly one 25-token doc; the NULL-text doc 1
    # ahead of it in the order contributes a NULL running sum and drops
    assert got == want == [(2, "en", "s")]


def test_null_text_leads_order_everything_fits(spark):
    # the "everything fits" branch must ALSO drop leading NULL-token
    # rows: with every real doc scoring below 0.55, the NULL-text doc
    # heads the quality order and its running sum never leaves NULL —
    # the naive window (and DuckDB oracle) keep nothing of it even
    # though the budget is never exhausted.
    import pandas as pd

    from tools.curation_chain_oracle_draft import (
        build_curation_chain_oracle_sql, curation_chain)

    rows = [(1, None, "en", "s"),
            (2, "spam!!!! ????? ..... !!!! more spam!!!!", "en", "s")]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string")
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source"]))
    got = [tuple(r) for r in
           curation_chain(df, cap_tokens=10_000, min_quality=0.0,
                          budget_tokens=10_000).collect()]
    want = [tuple(r) for r in con.execute(
        build_curation_chain_oracle_sql(10_000, 0.0, 10_000)).fetchall()]
    assert got == want == [(2, "en", "s")]


def test_stage_semantics_small(spark):
    # 1 domain over cap (only best-quality survives the cap), an exact
    # duplicate pair (min id kept), a low-quality doc (gate), and a
    # budget that then cuts the tail.
    good = ("solid informative sentence with plenty of words and "
            "reasonable structure here") * 3
    rows = [(1, good + " one", "a"),
            (2, good + " one", "a"),          # exact dup of 1 -> dropped
            (3, "spam!!!! ????? ..... !!!!", "a"),   # low quality -> gate
            (4, good + " four", "b"),
            (5, good + " five", "b")]
    df = spark.createDataFrame(rows, "doc_id long, text string, src string")
    kept = _ids(curate_corpus(df, "text", "doc_id", "src",
                              cap_tokens=200, min_quality=0.5,
                              budget_tokens=10_000))
    assert 2 not in kept and 3 not in kept and 1 in kept
    # budget cut: tiny budget keeps only the best-ranked survivor(s)
    tight = _ids(curate_corpus(df, "text", "doc_id", "src",
                               cap_tokens=200, min_quality=0.5,
                               budget_tokens=40))
    assert set(tight) < set(kept) and len(tight) >= 1
