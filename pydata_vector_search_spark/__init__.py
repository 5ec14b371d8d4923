"""pydata_vector_search_spark — a PySpark-native analytics + vector-search engine.

Re-implements, Spark-first, the capability surface of the reference demo
`andywalner/pydata_vector_search` (Spark 3.5 + Hudi vector-search fork + Lance):
one columnar table serving (1) vector top-k search, (2) hybrid search
(vector + SQL predicate), (3) SQL analytics — plus the LLM-data-pipeline
operators (dedup, similarity join, text analysis, multimodal plumbing) and a
relational surface, all expressed as Catalyst-optimizable DataFrame plans.

Design stance (SURVEY.md §7): Parquet tables + a tiny catalog + native Catalyst
expressions for vector distance + MLlib for batch index build + Structured
Streaming for the events extension. No JNI, no custom execution engine —
Catalyst/Tungsten pick the physical strategy.
"""

from pydata_vector_search_spark.session import get_spark
from pydata_vector_search_spark.catalog import Catalog
from pydata_vector_search_spark.engine import Engine

__all__ = ["get_spark", "Catalog", "Engine"]
__version__ = "0.2.1"
