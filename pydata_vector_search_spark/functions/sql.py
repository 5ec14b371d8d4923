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


# --------------------------------------------------------------------------
# vector_search TVF (reference: hudi_vector_search, demo.ipynb c11:7-13)
# --------------------------------------------------------------------------
# The reference's SQL entry point is a table-valued function:
#     SELECT * FROM hudi_vector_search('<path>', '<col>',
#                                      (SELECT q FROM ...), k, 'cosine')
# emitting rows + `_distance`. Spark has no native TVF extension point that
# could return a distributed scan, and a Python UDTF would evaluate the
# whole search inside one Python worker — the wrong plan. Instead the
# engine REWRITES the TVF call before parsing: arguments are evaluated
# (the query-vector scalar subquery runs exactly once, like the
# reference's), the equivalent DataFrame plan is built via
# operators.knn.vector_search, registered as a temp view, and the call
# site is replaced by the view name. The physical plan is therefore
# IDENTICAL to the DataFrame spelling — pruned columnar scan →
# TakeOrderedAndProject — pinned by tests/test_sql_surface.py.

_TVF_NAMES = ("vector_search", "hudi_vector_search")


def _split_top_level(s: str) -> list[str]:
    parts, depth, cur, i = [], 0, [], 0
    while i < len(s):
        c = s[i]
        if c == "'":
            j = s.index("'", i + 1)
            cur.append(s[i:j + 1]); i = j + 1
            continue
        if c in "([":
            depth += 1
        elif c in ")]":
            depth -= 1
        if c == "," and depth == 0:
            parts.append("".join(cur).strip()); cur = []
        else:
            cur.append(c)
        i += 1
    if cur:
        parts.append("".join(cur).strip())
    return parts


_TVF_COUNTER = [0]


def _eval_tvf_call(spark: SparkSession, argstr: str, resolve_table) -> str:
    args = _split_top_level(argstr)
    if not 4 <= len(args) <= 7:
        raise ValueError(
            "vector_search(table_or_path, vector_col, query_vec, k"
            "[, metric[, tiebreaker[, round_to]]]) — got "
            f"{len(args)} arguments")

    def _s(a: str) -> str:
        a = a.strip()
        if not (a.startswith("'") and a.endswith("'")):
            raise ValueError(f"expected a string literal, got {a!r}")
        return a[1:-1]

    table, vector_col = _s(args[0]), _s(args[1])
    # the query vector: a scalar subquery `(SELECT ...)` or any SQL array
    # expression — evaluated ONCE driver-side (the reference's TVF also
    # resolves its subquery argument to a literal before searching)
    qrow = spark.sql(f"SELECT {args[2]} AS q").first()
    qvec = [float(v) for v in qrow.q]
    k = int(args[3])
    metric = _s(args[4]) if len(args) > 4 else "cosine"
    tiebreaker = _s(args[5]) if len(args) > 5 else None
    round_to = int(args[6]) if len(args) > 6 else None

    df = resolve_table(table)
    from pydata_vector_search_spark.operators.knn import vector_search as vs
    out = vs(df, vector_col, qvec, k=k, metric=metric,
             tiebreaker=tiebreaker, round_to=round_to)
    _TVF_COUNTER[0] += 1
    view = f"__vector_search_tvf_{_TVF_COUNTER[0]}"
    out.createOrReplaceTempView(view)
    return view


def _default_resolver(spark: SparkSession):
    def resolve(name: str):
        try:
            return spark.table(name)       # temp view / session catalog
        except Exception:
            return spark.read.parquet(name)  # fall back: a parquet path
    return resolve


def rewrite_vector_search_sql(spark: SparkSession, query: str,
                              resolve_table=None) -> str:
    """Replace every ``vector_search(...)`` / ``hudi_vector_search(...)``
    call in ``query`` with a temp view holding the equivalent DataFrame
    plan; returns the rewritten SQL (a no-op when no call is present)."""
    import re

    resolve = resolve_table or _default_resolver(spark)
    pat = re.compile(r"\b(" + "|".join(_TVF_NAMES) + r")\s*\(", re.IGNORECASE)
    out = query
    while True:
        m = pat.search(out)
        if m is None:
            return out
        i, depth = m.end(), 1
        while depth:
            c = out[i]
            if c == "'":
                i = out.index("'", i + 1)
            elif c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            i += 1
        view = _eval_tvf_call(spark, out[m.end():i - 1], resolve)
        out = out[:m.start()] + view + out[i:]


def sql_with_tvf(spark: SparkSession, query: str, resolve_table=None):
    """``spark.sql`` with the vector-search TVF rewrite applied."""
    return spark.sql(rewrite_vector_search_sql(spark, query, resolve_table))
