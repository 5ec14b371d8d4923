"""Content-defined chunking: lossless reassembly, CDC edit-stability."""

import pytest
from pyspark.sql import functions as F

from pydata_vector_search_spark.catalog import read_table
from pydata_vector_search_spark.functions.text import normalized_text
from pydata_vector_search_spark.operators.chunking import (chunk_summary,
                                                           chunk_texts)


def test_chunks_reassemble_to_original(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents").limit(30)
    chunks = chunk_texts(docs, "text", "doc_id", divisor=16)
    reassembled = (chunks.groupBy("doc_id")
                   .agg(F.concat_ws(" ", F.transform(
                        F.array_sort(F.collect_list(
                            F.struct("chunk_idx", "chunk_text"))),
                        lambda s: s["chunk_text"])).alias("rebuilt")))
    joined = (docs.select("doc_id", normalized_text("text").alias("norm"))
                  .join(reassembled, "doc_id"))
    bad = joined.filter(F.col("norm") != F.col("rebuilt")).count()
    assert bad == 0


def test_chunk_sizes_average_near_divisor(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    s = chunk_summary(docs, "text", "doc_id", divisor=16) \
        .agg(F.avg("n_tokens").alias("avg")).head().avg
    assert 8 < s < 40          # geometric-ish around the divisor


def test_edit_stability(spark):
    """The CDC property: appending text must not change earlier chunks."""
    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lam mu nu xi omicron pi rho sigma tau upsilon phi chi psi") * 3
    df1 = spark.createDataFrame([(1, base)], "doc_id int, text string")
    df2 = spark.createDataFrame([(1, base + " appended trailing words")],
                                "doc_id int, text string")
    c1 = {r.chunk_idx: r.chunk_fp
          for r in chunk_summary(df1, "text", "doc_id", divisor=8).collect()}
    c2 = {r.chunk_idx: r.chunk_fp
          for r in chunk_summary(df2, "text", "doc_id", divisor=8).collect()}
    shared = sorted(set(c1) & set(c2))[:-1]     # all but the final chunk(s)
    assert shared
    for k in shared[:-1]:
        assert c1[k] == c2[k]


def test_chunks_feed_embedding(spark, sf_dir):
    from pydata_vector_search_spark.operators.embedding import (HashEncoder,
                                                                embed_text)
    docs = read_table(spark, sf_dir, "documents").limit(5)
    chunks = chunk_texts(docs, "text", "doc_id", divisor=16)
    emb = embed_text(chunks, "chunk_text", "vec", encoder=HashEncoder(dim=16))
    r = emb.select(F.size("vec").alias("d")).head()
    assert r.d == 16
