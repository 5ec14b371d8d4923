"""Quickstart — the reference demo's three patterns in ~18 lines.

Mirrors andywalner/pydata_vector_search demo.ipynb against this
engine: c11 (TVF vector search + metadata join), c13 (hybrid
filtered search — here pushed INTO the scan instead of post-filtered),
c15 (SQL analytics over the same table). Runs on the sf0.001 testdata
in well under a minute:

    python examples/quickstart.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from pydata_vector_search_spark import Engine  # noqa: E402

SF = "/root/testdata/sf0.001"
spark = (SparkSession.builder.master("local[4]")
         .config("spark.sql.shuffle.partitions", "8").getOrCreate())
eng = Engine(spark, "/tmp/pvs_quickstart")
eng.ingest(spark.read.parquet(f"{SF}/embeddings.parquet"), "embeddings",
           key="vec_id")
eng.ingest(spark.read.parquet(f"{SF}/documents.parquet"), "documents",
           key="doc_id")
eng.register_sql("embeddings", "documents")

# 1. semantic search (c11): TVF spelling + metadata join
eng.sql("""
    SELECT d.doc_id, d.lang, d.source, round(1 - v._distance, 2) AS score
    FROM vector_search('embeddings', 'embedding',
                       (SELECT embedding FROM embeddings WHERE vec_id = 0),
                       10, 'cosine') v
    JOIN documents d ON v.vec_id = d.doc_id
    ORDER BY score DESC, d.doc_id""").show()

# 2. hybrid search (c13): the filter prunes BEFORE the distance top-k
qv = eng.table("embeddings").filter("vec_id = 0").head().embedding
eng.vector_search("embeddings", "embedding", qv, k=5,
                  filter=F.col("label") < 5).show()

# 3. SQL analytics (c15) over the same governed table
eng.sql("""
    SELECT lang, count(*) AS n_docs
    FROM documents GROUP BY lang ORDER BY n_docs DESC, lang
    LIMIT 15""").show()
