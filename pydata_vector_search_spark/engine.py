"""Engine facade: the user-facing API tying catalog + operators together.

A user of the reference demo does three things (README.md:11-21): ingest a
table with embeddings, run vector / hybrid search, run SQL analytics. This
class is that surface, Spark-native.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession

from pydata_vector_search_spark.catalog import Catalog
from pydata_vector_search_spark.operators import knn, upsert as upsert_op


class Engine:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.catalog = Catalog(spark, root)

    # -- ingest (reference EP1: createDataFrame → hudi write, c8) ---------
    def ingest(self, df: DataFrame, table: str, key: str | None = None,
               mode: str = "overwrite", partition_by: list[str] | None = None):
        return self.catalog.write(table, df, key=key, mode=mode,
                                  partition_by=partition_by)

    def table(self, name: str) -> DataFrame:
        return self.catalog.load(name)

    def sql(self, query: str) -> DataFrame:
        return self.spark.sql(query)

    # -- vector search (reference EP2: hudi_vector_search TVF, c11/c13) ---
    def vector_search(self, table: str | DataFrame, vector_col: str,
                      query_vec: Sequence[float] | Column, k: int = 10,
                      metric: str = "cosine", filter: Column | None = None,
                      **kw) -> DataFrame:
        df = self.table(table) if isinstance(table, str) else table
        return knn.vector_search(df, vector_col, query_vec, k=k,
                                 metric=metric, filter=filter, **kw)

    # -- upsert (reference U1: Hudi keyed upsert, c8:17-23) ---------------
    def upsert(self, table: str, new: DataFrame, key: str | None = None) -> None:
        upsert_op.upsert_table(self.catalog, table, new, key=key)
