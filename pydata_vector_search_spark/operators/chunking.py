"""Content-defined document chunking (training-pipeline op; no reference
counterpart — the split-for-embedding stage of an LLM data pipeline).

Boundaries are CONTENT-defined, not offset-defined: a token ends a chunk
when ``hash(token) % divisor == 0``, so average chunk length ≈ ``divisor``
tokens and — the property fixed-size windows lack — an edit only moves
boundaries inside its own chunk; everything after the next boundary token
realigns identically (dedup-stable chunking, the rolling-hash/CDC idea
from rsync/LBFS applied at token granularity).

Fully JVM-side and shuffle-minimal: posexplode tokens → scalar md5-derived
boundary flag → running-sum window gives the chunk index (one shuffle on
doc id; the groupBy that follows reuses the exchange). The hash is the
same md5-hex-parse family as the minhash permutations, so the whole
operator is reproducible in any engine with md5 — the declared query is
DuckDB-oracle-checked end to end.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from pydata_vector_search_spark.operators.dedup import tokens_col


def _is_boundary(tok: Column, divisor: int) -> Column:
    h = F.conv(F.substring(F.md5(tok), 1, 8), 16, 10).cast("long")
    return (h % divisor == 0).cast("int")


def content_defined_chunks(df: DataFrame, text_col: str, id_col: str,
                           divisor: int = 32) -> DataFrame:
    """Chunk assignment per token: (id, chunk_idx, pos, tok). Average chunk
    ≈ ``divisor`` tokens; chunk_idx is 0-based and dense per document."""
    toks = (df.select(F.col(id_col).alias("__id"),
                      F.posexplode(tokens_col(text_col)).alias("__pos", "__tok")))
    w = (Window.partitionBy("__id").orderBy("__pos")
               .rowsBetween(Window.unboundedPreceding, -1))
    chunk = F.coalesce(F.sum(_is_boundary(F.col("__tok"), divisor)).over(w),
                       F.lit(0))
    return toks.withColumn("__chunk", chunk.cast("long"))


def chunk_summary(df: DataFrame, text_col: str, id_col: str,
                  divisor: int = 32) -> DataFrame:
    """One row per chunk: token count, start position, md5 fingerprint of
    the chunk text (order-exact via sorted struct reassembly)."""
    t = content_defined_chunks(df, text_col, id_col, divisor)
    assembled = F.concat_ws(
        " ", F.transform(F.array_sort(F.collect_list(
            F.struct(F.col("__pos"), F.col("__tok")))),
            lambda s: s["__tok"]))
    return (t.groupBy(F.col("__id").alias(id_col),
                      F.col("__chunk").alias("chunk_idx"))
             .agg(F.count(F.lit(1)).alias("n_tokens"),
                  F.min("__pos").cast("long").alias("start_pos"),
                  F.md5(assembled).alias("chunk_fp"))
             .withColumn("n_tokens", F.col("n_tokens").cast("long")))


def chunk_texts(df: DataFrame, text_col: str, id_col: str,
                divisor: int = 32) -> DataFrame:
    """One row per chunk with the chunk text itself — the hand-off point to
    the embedding pipeline (operators/embedding.embed_text)."""
    t = content_defined_chunks(df, text_col, id_col, divisor)
    assembled = F.concat_ws(
        " ", F.transform(F.array_sort(F.collect_list(
            F.struct(F.col("__pos"), F.col("__tok")))),
            lambda s: s["__tok"]))
    return (t.groupBy(F.col("__id").alias(id_col),
                      F.col("__chunk").alias("chunk_idx"))
             .agg(assembled.alias("chunk_text"),
                  F.count(F.lit(1)).cast("long").alias("n_tokens")))
