"""Corpus → training epoch, end to end, in ~15 lines of engine calls.

The two compositions the engine stages around: `curate_corpus`
(per-domain cap → exact dedup → quality gate → token budget) selects
WHAT to train on; the packing operators (temperature mix → sequence
pack → shard shuffle) turn the selection into epoch shards. Runs on
the sf0.001 testdata in under a minute:

    python examples/corpus_to_epoch.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from pydata_vector_search_spark.functions.text import token_count  # noqa: E402
from pydata_vector_search_spark.operators.curation import curate_corpus  # noqa: E402
from pydata_vector_search_spark.operators.packing import (  # noqa: E402
    pack_sequences, shard_shuffle, temperature_mix)

SF = "/root/testdata/sf0.001"
spark = (SparkSession.builder.master("local[4]")
         .config("spark.sql.shuffle.partitions", "8").getOrCreate())
docs = spark.read.parquet(f"{SF}/documents.parquet")

# 1. curate: domain cap -> exact dedup -> quality gate -> token budget
curated = curate_corpus(docs, "text", "doc_id", "source",
                        cap_tokens=2000, min_quality=0.5,
                        budget_tokens=5000, distributed=True)

# 2. temperature-balance the surviving languages (alpha=0.5 flattening)
mixed = temperature_mix(curated, "doc_id", "lang", alpha=0.5,
                        sample_frac=0.9, seed=42)

# 3. pack into 256-token bins, shuffle bins into 4 epoch shards
sized = mixed.select("doc_id", token_count("text").cast("long")
                     .alias("n_tok"))
packed = pack_sequences(sized, "doc_id", "n_tok", max_len=256,
                        block_span=100)
shards = shard_shuffle(packed.select("bin_id").distinct(), "bin_id",
                       num_shards=4, seed=7)

print(f"curated docs: {curated.count()}, mixed: {mixed.count()}, "
      f"bins: {packed.select('bin_id').distinct().count()}")
shards.groupBy("shard").agg(F.count(F.lit(1)).alias("n_bins")) \
      .orderBy("shard").show()
