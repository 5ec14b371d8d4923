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


def _ids(df):
    return sorted(r.doc_id for r in df.select("doc_id").collect())


def test_distributed_path_equals_default_on_real_data(spark):
    # r10: the driver-free bucket-routed whale path must return EXACTLY
    # the single-window rows, on real data with NULL texts included.
    docs = read_table(spark, SF, "documents")
    for cap in (0, 600, 5_000):
        got = _ids(domain_token_cap(docs, "text", "doc_id", "source",
                                    cap_tokens=cap, distributed=True))
        want = _ids(domain_token_cap(docs, "text", "doc_id", "source",
                                     cap_tokens=cap))
        assert got == want, cap


def test_distributed_path_one_quality_whale(spark):
    # whale domain where every doc shares ONE quality value: the
    # boundary bucket IS the whole domain, so the id-range sub-bucket
    # machinery alone bounds per-task input — and must stay exact,
    # including the mid-sub-bucket cutoff.
    rows = [(i, "same same same", "whale") for i in range(500)] + \
           [(1000, "other words here", "tiny")]
    df = spark.createDataFrame(rows, "doc_id long, text string, src string")
    for cap in (7, 100, 3 * 137, 10_000):
        got = _ids(domain_token_cap(df, "text", "doc_id", "src",
                                    cap_tokens=cap, distributed=True,
                                    prefix_buckets=8))
        want = _ids(domain_token_cap(df, "text", "doc_id", "src",
                                     cap_tokens=cap))
        assert got == want, cap


def test_distributed_path_null_domain_and_quality(spark):
    # NULL domain is its own group; NULL text is the NULL-quality
    # bucket sorting last — both must survive the null-safe joins.
    rows = [(1, "alpha beta gamma delta", None),
            (2, None, None),
            (3, "words words", "a"),
            (4, None, "a")]
    df = spark.createDataFrame(rows, "doc_id long, text string, src string")
    for cap in (0, 2, 10_000):
        got = _ids(domain_token_cap(df, "text", "doc_id", "src",
                                    cap_tokens=cap, distributed=True))
        want = _ids(domain_token_cap(df, "text", "doc_id", "src",
                                     cap_tokens=cap))
        assert got == want, cap


def test_distributed_null_keys_in_keepable_boundary_bucket(spark):
    # r10 ADVICE repro: the boundary-offset join must be NULL-safe on
    # __d AND __b. Quality ladder 0.9 (1 tok) -> 0.5 (2 tok) -> NULL
    # bucket (0 tok + 3 tok) with cap=5: the NULL-quality bucket is the
    # BOUNDARY bucket (exc=3 <= 5 < inc=6) and its zero-token doc 3
    # fits the residual — a plain equi-join silently dropped it. Run
    # the same shape with a real domain and with a NULL domain.
    from pyspark.sql import functions as F
    for dom in ("a", None):
        rows = [(1, "w", 0.9, dom), (2, "w w", 0.5, dom),
                (3, "", None, dom), (4, "w w w", None, dom)]
        df = spark.createDataFrame(
            rows, "doc_id long, text string, q double, src string")
        want = _ids(domain_token_cap(df, "text", "doc_id", "src",
                                     cap_tokens=5, quality_col=F.col("q")))
        assert want == [1, 2, 3], dom   # boundary-keep really exercised
        got = _ids(domain_token_cap(df, "text", "doc_id", "src",
                                    cap_tokens=5, quality_col=F.col("q"),
                                    distributed=True))
        assert got == want, dom


def test_distributed_equality_fuzz_with_null_keys(spark):
    # seeded fuzz (r10 ADVICE follow-up): random corpora where NULL
    # domains and NULL qualities routinely land in boundary buckets,
    # swept across caps; distributed must equal default every time.
    import random

    from pyspark.sql import functions as F
    rng = random.Random(11)
    for trial in range(4):
        rows = [(i,
                 "" if rng.random() < 0.15
                 else "w " * rng.randrange(1, 6),
                 None if rng.random() < 0.3
                 else round(rng.choice([0.2, 0.5, 0.9]), 6),
                 rng.choice([None, "a", "b"]))
                for i in range(60)]
        df = spark.createDataFrame(
            rows, "doc_id long, text string, q double, src string")
        for cap in (0, 1, 4, 9, 50):
            kw = dict(cap_tokens=cap, quality_col=F.col("q"))
            got = _ids(domain_token_cap(df, "text", "doc_id", "src",
                                        distributed=True,
                                        prefix_buckets=4, **kw))
            want = _ids(domain_token_cap(df, "text", "doc_id", "src", **kw))
            assert got == want, (trial, cap)


def test_distributed_path_guards(spark):
    df = spark.createDataFrame([("x", "t", "a")],
                               "doc_id string, text string, src string")
    with pytest.raises(TypeError, match="integral"):
        domain_token_cap(df, "text", "doc_id", "src", cap_tokens=5,
                         distributed=True)
    ok = spark.createDataFrame([(1, "t", "a")],
                               "doc_id long, text string, src string")
    with pytest.raises(ValueError, match="prefix_buckets"):
        domain_token_cap(ok, "text", "doc_id", "src", cap_tokens=5,
                         distributed=True, prefix_buckets=0)


def test_tournament_is_lossy_for_running_sums(spark):
    # The counterexample the docstring cites: cap=10, one bucket holds
    # [11] (over cap alone), another holds [5] ranked after it. True
    # semantics drop BOTH (the first doc busts the cap, so every later
    # doc's inclusive cum > cap); a salted level-1 local-cum filter
    # would remove the 11-token doc and let the 5-token doc's survivor
    # cum pass. Pins WHY domain_token_cap has no tournament branch.
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    rows = [(1, 11, "d"), (2, 5, "d")]
    df = spark.createDataFrame(rows, "doc_id long, nt long, src string")
    cap = 10
    w = (Window.partitionBy("src").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    true_kept = _ids(df.withColumn("c", F.sum("nt").over(w))
                     .filter(F.col("c") <= cap))
    assert true_kept == []
    # tournament: salt doc 1 and doc 2 into different buckets
    salted = df.withColumn("salt", F.col("doc_id") % 2)
    w1 = (Window.partitionBy("src", "salt").orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    lvl1 = (salted.withColumn("c1", F.sum("nt").over(w1))
            .filter(F.col("c1") <= cap))
    lvl2 = (lvl1.withColumn("c2", F.sum("nt").over(w))
            .filter(F.col("c2") <= cap))
    assert _ids(lvl2) == [2]  # wrongly kept — the lossiness witness
