"""SQL surface: the engine's functions registered as SQL temporary functions.

The reference exposes vector search to SQL via the engine-provided
``hudi_vector_search`` TVF plus temp views (demo.ipynb c11:7-13). Spark 4's
SQL scalar UDFs (``CREATE TEMPORARY FUNCTION ... RETURN <expr>``) let us
register the distance/text functions with pure-SQL bodies — Catalyst
INLINES the body into the calling plan (no Python, no JVM UDF object), so
the SQL spelling has the identical physical plan to the DataFrame spelling:
whole-stage codegen, pushdown-friendly, zero per-row overhead.

After ``register_sql_functions(spark)`` the reference's cell-11 query is
literally expressible:

    SELECT e.*, round(1 - cosine_distance(e.embedding, q.q_vec), 2) AS score
    FROM embeddings e, query_input q
    ORDER BY score DESC LIMIT 10
"""

from __future__ import annotations

from pyspark.sql import SparkSession

_DOT = "aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, x) -> acc + x)"
_NORM_A = "sqrt(aggregate(transform(a, x -> x * x), 0D, (acc, x) -> acc + x))"
_NORM_B = "sqrt(aggregate(transform(b, x -> x * x), 0D, (acc, x) -> acc + x))"

_FUNCTIONS: dict[str, str] = {
    "dot_product": f"""
        (a ARRAY<DOUBLE>, b ARRAY<DOUBLE>) RETURNS DOUBLE
        RETURN {_DOT}""",
    "l2_norm": f"""
        (a ARRAY<DOUBLE>) RETURNS DOUBLE
        RETURN {_NORM_A}""",
    "l2_distance": """
        (a ARRAY<DOUBLE>, b ARRAY<DOUBLE>) RETURNS DOUBLE
        RETURN sqrt(aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)),
                              0D, (acc, x) -> acc + x))""",
    "cosine_similarity": f"""
        (a ARRAY<DOUBLE>, b ARRAY<DOUBLE>) RETURNS DOUBLE
        RETURN {_DOT} / ({_NORM_A} * {_NORM_B})""",
    "cosine_distance": f"""
        (a ARRAY<DOUBLE>, b ARRAY<DOUBLE>) RETURNS DOUBLE
        RETURN 1.0D - {_DOT} / ({_NORM_A} * {_NORM_B})""",
    "token_count": r"""
        (t STRING) RETURNS INT
        RETURN CASE WHEN length(trim(t)) = 0 THEN 0
                    ELSE size(split(trim(t), '\\s+')) END""",
    "fingerprint_md5": r"""
        (t STRING) RETURNS STRING
        RETURN md5(trim(regexp_replace(lower(t), '\\s+', ' ')))""",
}


def register_sql_functions(spark: SparkSession) -> list[str]:
    """Register all engine SQL functions; returns the registered names."""
    for name, body in _FUNCTIONS.items():
        spark.sql(f"CREATE OR REPLACE TEMPORARY FUNCTION {name} {body}")
    return sorted(_FUNCTIONS)
