"""Tokenizer hook (operators/tokenize.py): executor-side counts match
the JVM Column expression, arbitrary tokenizers plug in, and the counts
drive packing end-to-end."""

import pytest
from pyspark.sql import functions as F

from pydata_vector_search_spark.catalog import read_table
from pydata_vector_search_spark.functions.text import token_count_bpe
from pydata_vector_search_spark.operators.tokenize import (
    HuggingFaceTokenizer, RegexBpeTokenizer, tokenize_counts)


def test_tokenize_counts_matches_column_expr(spark, sf_dir):
    """Default (RegexBpeTokenizer) mapInPandas counts are bit-identical
    to the codegen'd token_count_bpe Column — swapping the hook in or
    out of a pipeline cannot move results."""
    docs = read_table(spark, sf_dir, "documents").limit(200)
    got = tokenize_counts(docs.select("doc_id", "text"), "text")
    rows = (got.withColumn("jvm", token_count_bpe("text").cast("long"))
               .filter(F.col("n_tok") != F.col("jvm")).count())
    assert rows == 0
    assert dict(got.dtypes)["n_tok"] == "bigint"


def test_tokenize_counts_null_and_empty(spark):
    df = spark.createDataFrame([(1, None), (2, ""), (3, "a b!")],
                               "doc_id long, text string")
    got = {r.doc_id: r.n_tok for r in
           tokenize_counts(df, "text").collect()}
    assert got == {1: 0, 2: 0, 3: 3}


def test_pack_on_stub_tokenizer_counts(spark):
    """The epoch path on a REAL-tokenizer stand-in: a stub tokenizer
    (fixed 3 tokens per character class, deliberately different from
    the regex fallback) feeds pack_sequences via the documented
    ``len_col`` contract; bins respect capacity under the stub's
    counts."""
    from pydata_vector_search_spark.operators.packing import pack_sequences

    class StubTokenizer:
        def count_batch(self, texts):
            return [2 * len((t or "").split()) + 1 for t in texts]

    rows = [(i, " ".join(f"w{j}" for j in range(i % 7 + 1)))
            for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    counted = tokenize_counts(df, "text", tokenizer=StubTokenizer())
    want = {r.doc_id: 2 * len(r.text.split()) + 1 for r in df.collect()}
    assert {r.doc_id: r.n_tok for r in counted.collect()} == want

    packed = pack_sequences(counted, "doc_id", "n_tok",
                            max_len=16, block_span=25)
    fills = (packed.groupBy("bin_id")
             .agg(F.sum("n_tok").alias("fill"),
                  F.count(F.lit(1)).alias("n")).collect())
    for r in fills:
        assert r.fill <= 16 or r.n == 1   # oversize doc gets its own bin


def test_huggingface_tokenizer_import_gated():
    with pytest.raises(ImportError, match="tokenizers"):
        HuggingFaceTokenizer("/nonexistent/tokenizer.json")


def test_regex_tokenizer_custom_pattern():
    tok = RegexBpeTokenizer(pattern=r"[a-z]+")
    assert tok.count_batch(["abc DEF ghi", ""]) == [2, 0]
