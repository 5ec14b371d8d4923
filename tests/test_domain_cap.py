"""Per-domain token cap (operators/text_ops.domain_token_cap):
DuckDB window parity on real testdata, NULL placement, cap edge cases."""

import duckdb
import pytest

from pydata_vector_search_spark.catalog import read_table
from pydata_vector_search_spark.operators.text_ops import domain_token_cap

SF = "/root/testdata/sf0.01"


def test_domain_cap_matches_window_oracle(spark):
    """Engine result == the naive per-domain running-sum window, with
    the engine's OWN quality/token columns replayed through DuckDB so
    the comparison isolates the cap semantics."""
    from pyspark.sql import functions as F

    from pydata_vector_search_spark.functions.text import (quality_score,
                                                           token_count)
    docs = read_table(spark, SF, "documents")
    cap = 600
    got = sorted(r.doc_id for r in
                 domain_token_cap(docs, "text", "doc_id", "source",
                                  cap_tokens=cap).collect())
    base = docs.select(
        "doc_id", "source",
        F.round(quality_score("text"), 6).alias("qb"),
        F.coalesce(token_count("text").cast("long"), F.lit(0)).alias("nt"))
    pdf = base.toPandas()
    con = duckdb.connect()
    con.register("base", pdf)
    want = sorted(r[0] for r in con.execute(f"""
        SELECT doc_id FROM (
          SELECT doc_id, sum(nt) OVER (
            PARTITION BY source
            ORDER BY qb DESC NULLS LAST, doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM base) WHERE cum <= {cap}""").fetchall())
    assert got == want and 0 < len(got) < pdf.shape[0]


def test_domain_cap_null_text_sorts_last(spark):
    rows = [(1, "good long text with many proper words here", "a"),
            (2, None, "a"),
            (3, "ok words", "a")]
    df = spark.createDataFrame(rows, "doc_id long, text string, src string")
    # cap generous: NULL text adds 0 tokens, so everything survives —
    # but only BECAUSE nulls coalesce; then a tight cap drops real docs
    # before the NULL row costs anything
    all_ids = sorted(r.doc_id for r in
                     domain_token_cap(df, "text", "doc_id", "src",
                                      cap_tokens=10_000).collect())
    assert all_ids == [1, 2, 3]


def test_domain_cap_zero_and_guard(spark):
    rows = [(1, "some words", "a")]
    df = spark.createDataFrame(rows, "doc_id long, text string, src string")
    assert domain_token_cap(df, "text", "doc_id", "src",
                            cap_tokens=0).count() == 0
    with pytest.raises(ValueError, match="cap_tokens"):
        domain_token_cap(df, "text", "doc_id", "src", cap_tokens=-1)


def test_domain_cap_independent_domains(spark):
    # one spammy domain must not eat another domain's budget
    rows = ([(i, "w " * 50, "spam") for i in range(10)]
            + [(100, "unique quality text", "tiny")])
    df = spark.createDataFrame([(i, t.strip(), s) for i, t, s in rows],
                               "doc_id long, text string, src string")
    kept = {r.doc_id for r in
            domain_token_cap(df, "text", "doc_id", "src",
                             cap_tokens=100).collect()}
    assert 100 in kept and len(kept & set(range(10))) == 2  # 2*50 <= 100
