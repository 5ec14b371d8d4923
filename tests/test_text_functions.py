"""Text function unit tests incl. rolling hash vs pure-Python reference."""

import pytest
from pyspark.sql import functions as F

from pydata_vector_search_spark.functions import text as T


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "The quick brown fox and the lazy dog."),
        (1, "  El  perro   y los gatos  "),
        (2, "le chat et les chiens"),
        (3, "der Hund und die Katze"),
        (4, "这是一个中文句子"),
        (5, "word " * 50),
        (6, "x"),
    ]
    return spark.createDataFrame(rows, "id int, text string").cache()


def test_token_count(docs):
    got = {r.id: r.n for r in docs.select("id", T.token_count("text").alias("n")).collect()}
    assert got[0] == 8
    assert got[1] == 5  # whitespace runs collapse, leading/trailing trimmed
    assert got[6] == 1


def test_normalized_and_fingerprint(spark):
    df = spark.createDataFrame(
        [(1, "Hello   World"), (2, "hello world"), (3, "HELLO\tWORLD ")],
        "id int, text string")
    fps = [r.fp for r in df.select(T.fingerprint_md5("text").alias("fp")).collect()]
    assert fps[0] == fps[1] == fps[2]


def _py_rolling(s, base=31, mod=2_147_483_647):
    acc = 0
    for ch in s:
        acc = (acc * base + ord(ch)) % mod
    return acc


def test_rolling_hash_matches_python(spark):
    samples = ["abc", "hello world", "The quick brown fox", ""]
    df = spark.createDataFrame([(s,) for s in samples], "text string")
    got = [r.h for r in df.select(T.rolling_hash("text").alias("h")).collect()]
    assert got == [_py_rolling(s) for s in samples]


def test_lang_id(docs):
    got = {r.id: r.lang for r in docs.select("id", T.lang_id("text").alias("lang")).collect()}
    assert got[0] == "en"
    assert got[1] == "es"
    assert got[2] == "fr"
    assert got[3] == "de"
    assert got[4] == "zh"
    assert got[5] == "und"  # no marker words


def test_quality_score_bounds(docs):
    vals = [r.q for r in docs.select(T.quality_score("text").alias("q")).collect()]
    assert all(0.0 <= v <= 1.0 for v in vals)


def test_lang_id_table_matches_column_expr(spark, sf_dir):
    from pyspark.sql import functions as F

    from pydata_vector_search_spark.catalog import read_table
    from pydata_vector_search_spark.functions.text import lang_id
    from pydata_vector_search_spark.operators.text_ops import lang_id_table

    docs = read_table(spark, sf_dir, "documents")
    col_version = {r.doc_id: r.l for r in
                   docs.select("doc_id", lang_id("text").alias("l")).collect()}
    table_version = {r.doc_id: r.pred_lang for r in
                     lang_id_table(docs, "text", "doc_id").collect()}
    assert table_version == col_version


def test_lang_id_table_synthetic_langs(spark):
    from pydata_vector_search_spark.operators.text_ops import lang_id_table

    df = spark.createDataFrame(
        [(1, "the cat and the dog of the house"),
         (2, "el gato los perros las casas"),
         (3, "le chat et les chiens"),
         (4, "der hund und die katze"),
         (5, "xyz qqq zzz"),
         (6, "这是中文文本 the and of"),
         (7, "Это русский текст")],
        "doc_id int, text string")
    got = {r.doc_id: r.pred_lang
           for r in lang_id_table(df, "text", "doc_id").collect()}
    assert got == {1: "en", 2: "es", 3: "fr", 4: "de",
                   5: "und", 6: "zh", 7: "ru"}


def test_token_count_bpe_matches_python_re(spark, sf_dir):
    import re

    from pydata_vector_search_spark.catalog import read_table
    from pydata_vector_search_spark.functions.text import (BPE_ISH_PATTERN,
                                                           token_count_bpe)

    pat = re.compile(BPE_ISH_PATTERN)
    docs = read_table(spark, sf_dir, "documents").limit(100)
    rows = docs.select("doc_id", "text",
                       token_count_bpe("text").alias("n")).collect()
    assert rows
    for r in rows:
        assert r.n == len(pat.findall(r.text)), r.doc_id


def test_token_count_bpe_edge_cases(spark):
    from pydata_vector_search_spark.functions.text import token_count_bpe

    df = spark.createDataFrame(
        [(1, "hello, world!"),        # 2 words + 2 symbols
         (2, "abc123"),               # 1 letter-run + 3 single digits
         (3, ""),                     # empty
         (4, "  \t "),                # whitespace only
         (5, "don't stop")],          # apostrophe splits
        "i int, t string")
    got = {r.i: r.n for r in df.select("i", token_count_bpe("t").alias("n")).collect()}
    assert got == {1: 4, 2: 4, 3: 0, 4: 0, 5: 4}


def test_repetition_fractions(spark):
    from pydata_vector_search_spark.functions.text import (
        dup_bigram_fraction, dup_token_fraction)
    df = spark.createDataFrame(
        [(1, "spam spam spam spam"),         # 4 tokens, 1 distinct
         (2, "all words here are different"),
         (3, "go go go stop go go"),         # looped phrase
         (4, "one"),                         # single token: no bigrams
         (5, "")],
        "doc_id int, text string")
    out = {r.doc_id: (r.dt, r.db) for r in df.select(
        "doc_id",
        dup_token_fraction("text").alias("dt"),
        dup_bigram_fraction("text").alias("db")).collect()}
    assert out[1][0] == 0.75                # bigrams: 3 total, 1 distinct
    assert abs(out[1][1] - 2 / 3) < 1e-12
    assert out[2] == (0.0, 0.0)
    # doc 3: 6 tokens {go, stop} -> dt = 2/3; bigrams 5 total,
    # distinct {go go, go stop, stop go} -> db = 2/5
    assert abs(out[3][0] - 2 / 3) < 1e-12 and abs(out[3][1] - 0.4) < 1e-12
    assert out[4] == (0.0, 0.0)
    assert out[5][1] == 0.0


def test_select_token_budget_equals_global_window(spark):
    """The histogram-threshold plan must select EXACTLY the documents the
    naive global-order running-sum spelling selects, including the
    partial boundary bucket."""
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from pydata_vector_search_spark.operators.text_ops import \
        select_token_budget

    rng = random.Random(4)
    words = ["alpha", "beta", "gamma", "delta", "epsilon"]
    rows = [(i, " ".join(rng.choice(words)
                         for _ in range(rng.randrange(3, 30))))
            for i in range(120)]
    df = spark.createDataFrame(rows, "doc_id int, text string")

    from pydata_vector_search_spark.functions.text import (
        dup_token_fraction, token_count)
    metric = F.round(F.lit(1.0) - dup_token_fraction("text"), 3)

    for budget in (1, 50, 300, 900, 10**6):
        got = {r.doc_id for r in select_token_budget(
            df, "text", "doc_id", budget, quality_col=metric,
            bucket_decimals=3).collect()}
        w = (Window.orderBy(F.round(metric, 3).desc(),
                            F.col("doc_id").asc())
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        want = {r.doc_id for r in
                df.withColumn("__c", F.sum(token_count("text")
                                           .cast("long")).over(w))
                  .filter(F.col("__c") <= budget).collect()}
        assert got == want, budget


def test_select_token_budget_null_quality(spark):
    """NULL-quality documents sort LAST (NULLS-LAST desc order), are never
    conflated with the 'everything fits' case, and the cutoff landing
    inside the NULL bucket spends the residual budget there by id order."""
    from pyspark.sql import functions as F

    from pydata_vector_search_spark.operators.text_ops import \
        select_token_budget

    # doc 1-3: quality 0.9/0.8/0.7 with 10 tokens each; doc 4-5: NULL
    # quality, 10 tokens each.
    rows = [(i, " ".join(f"w{i}{j}" for j in range(10)),
             q) for i, q in [(1, 0.9), (2, 0.8), (3, 0.7),
                             (4, None), (5, None)]]
    df = spark.createDataFrame(rows, "doc_id int, text string, q double")

    def ids(budget):
        return {r.doc_id for r in select_token_budget(
            df, "text", "doc_id", budget, quality_col=F.col("q"),
            bucket_decimals=3).collect()}

    # budget exhausted inside the real buckets: NULLs must NOT leak in
    assert ids(25) == {1, 2}
    # cutoff lands exactly at the NULL bucket: residual spent by id ASC
    assert ids(40) == {1, 2, 3, 4}
    # whole corpus (incl. NULL-quality docs) fits
    assert ids(10**6) == {1, 2, 3, 4, 5}
    # NULL bucket is boundary with zero residual: no NULL doc fits
    assert ids(30) == {1, 2, 3}


def test_select_token_budget_null_token_corners(spark):
    """r12: the naive global window's NULL-token contract in EVERY
    branch of the histogram router. The naive running sum SKIPS NULL
    token counts and stays NULL until the first non-NULL one, so a
    NULL-token row is kept iff some non-NULL-token row precedes it in
    (quality DESC NULLS LAST, id) order: leading NULLs drop even from
    kept-outright above-cutoff buckets and from the everything-fits
    return; a NULL running sum in the boundary bucket is KEPT when a
    higher bucket holds real tokens (its naive sum is the above total,
    which fits). Checked against the naive window spelling itself, on
    both the single-task and the forced-distributed boundary paths."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from pydata_vector_search_spark.functions.text import token_count
    from pydata_vector_search_spark.operators.text_ops import \
        select_token_budget

    rows = [
        (0, None, 0.95),          # all-NULL bucket ABOVE everything
        (1, None, 0.9),           # leading NULL inside the first real bucket
        (2, "w1 w2 w3", 0.9),     # 3 tokens
        (3, None, 0.9),           # NULL after the bucket's first real token
        (4, None, 0.5),           # NULL heading the (sometimes) boundary
        (5, "x1 x2 x3 x4", 0.5),  # 4 tokens
        (6, None, 0.3),           # NULL-only bucket BELOW
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string, q double")
    w = (Window.orderBy(F.col("q").desc_nulls_last(), F.col("doc_id"))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    naive = df.withColumn("__c", F.sum(token_count("text")
                                       .cast("long")).over(w))

    for budget, expect in [(2, set()), (3, {2, 3, 4}), (6, {2, 3, 4}),
                           (7, {2, 3, 4, 5, 6}), (10**6, {2, 3, 4, 5, 6})]:
        want = {r.doc_id for r in
                naive.filter(F.col("__c") <= budget).collect()}
        assert want == expect, (budget, want)   # the scenario is as labeled
        for mbtr in (2_000_000, 0):             # single-task + distributed
            got = {r.doc_id for r in select_token_budget(
                df, "text", "doc_id", budget, quality_col=F.col("q"),
                max_boundary_task_rows=mbtr,
                prefix_buckets=3).collect()}
            assert got == want, (budget, mbtr, got)

    # an all-NULL-token corpus: the naive running sum never leaves NULL
    nul = spark.createDataFrame([(1, None, 0.5), (2, None, None)],
                                "doc_id int, text string, q double")
    for budget in (1, 10**6):
        assert select_token_budget(
            nul, "text", "doc_id", budget,
            quality_col=F.col("q")).count() == 0


def test_redact_pii(spark):
    from pydata_vector_search_spark.functions.text import redact_pii
    df = spark.createDataFrame(
        [(1, "write a.b+x@sub.example.co or ADMIN@X.ORG today"),
         (2, "host 192.168.001.255 and 8.8.8.8; not 1.2.3"),
         (3, "call +44 20 7946-0958 now, or 5551234567"),
         (4, "no pii here at all"),
         (5, "")],
        "i int, t string")
    got = {r.i: r.r for r in df.select(
        "i", redact_pii("t").alias("r")).collect()}
    assert got[1] == "write <EMAIL> or <EMAIL> today"
    assert got[2] == "host <IP> and <IP>; not 1.2.3"
    assert got[3] == "call <PHONE> now, or <PHONE>"
    assert got[4] == "no pii here at all"
    assert got[5] == ""
    # selective kinds: leave phones intact
    only_email = {r.i: r.r for r in df.select(
        "i", redact_pii("t", kinds=("email",)).alias("r")).collect()}
    assert only_email[3] == "call +44 20 7946-0958 now, or 5551234567"


def test_select_token_budget_distributed_boundary(spark):
    """r08 (VERDICT r07 #3): forcing the distributed prefix-sum path
    (max_boundary_task_rows=0) selects EXACTLY the same documents as
    the single-task boundary window AND leaves no unpartitioned
    WindowExec in the physical plan — the boundary running sum scales
    past one task. Also covers NULL-token rows (leading-NULL drop
    semantics must survive the offset decomposition)."""
    import random

    from pyspark.sql import functions as F

    from pydata_vector_search_spark.operators.text_ops import \
        select_token_budget

    rng = random.Random(11)
    words = ["alpha", "beta", "gamma", "delta"]
    rows = [(i, " ".join(rng.choice(words)
                         for _ in range(rng.randrange(3, 30))))
            for i in range(200)]
    rows += [(500 + i, None) for i in range(5)]     # NULL text rows
    df = spark.createDataFrame(rows, "doc_id int, text string")
    # a single-valued quality column makes EVERY row the boundary bucket
    # — the worst case the distributed path exists for
    one = F.when(F.col("text").isNotNull(), F.lit(1.0))

    for budget in (1, 40, 400, 1200):
        dist = select_token_budget(df, "text", "doc_id", budget,
                                   quality_col=one,
                                   max_boundary_task_rows=0,
                                   prefix_buckets=7)
        got = {r.doc_id for r in dist.collect()}
        want = {r.doc_id for r in select_token_budget(
            df, "text", "doc_id", budget, quality_col=one).collect()}
        assert got == want, budget
        plan = dist._jdf.queryExecution().executedPlan().toString()
        for line in plan.splitlines():
            if "Window [" in line:
                assert "__pb" in line, f"unpartitioned window:\n{line}"
