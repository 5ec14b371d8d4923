"""Column-expression function library (JVM-side, codegen-friendly).

Everything here returns a pyspark ``Column`` built from built-in functions —
never a Python UDF — so the hot path stays inside whole-stage codegen.
"""

from pydata_vector_search_spark.functions.vector import (
    dot_product,
    l2_norm,
    l2_distance,
    cosine_similarity,
    cosine_distance,
    dot_product_lit,
    l2_distance_lit,
    cosine_similarity_lit,
    cosine_distance_lit,
    dot_product_dim,
    l2_distance_dim,
    cosine_similarity_dim,
)
from pydata_vector_search_spark.functions.text import (
    token_count,
    normalized_text,
    fingerprint_md5,
    rolling_hash,
    quality_score,
    lang_id,
)

__all__ = [
    "dot_product", "l2_norm", "l2_distance", "cosine_similarity",
    "cosine_distance", "dot_product_lit", "l2_distance_lit",
    "cosine_similarity_lit", "cosine_distance_lit", "dot_product_dim",
    "l2_distance_dim", "cosine_similarity_dim", "token_count",
    "normalized_text", "fingerprint_md5", "rolling_hash", "quality_score",
    "lang_id",
]
