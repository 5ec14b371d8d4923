"""Vector distance expressions over ``array<float>`` columns.

The reference gets cosine distance from the Lance index inside the
`hudi_vector_search` TVF, emitting a `_distance` pseudo-column with
score = 1 - _distance (demo.ipynb c11:8,10, raw L724-728). Here the metric is
a first-class Catalyst expression over plain `array<float>` columns —
`zip_with` + `aggregate` — which means:

* it runs JVM-side inside whole-stage codegen (no Python, no JNI);
* Catalyst can push filters *below* it (the pre-filter hybrid search the
  reference explicitly lacks, demo.ipynb c13:1-4);
* accumulation is an explicit left-to-right fold **in double**, so results
  are deterministic and match a DuckDB oracle after rounding.

At 100 TB these expressions scan embarrassingly parallel over partitions —
no shuffle, no driver involvement; the only cost is bytes read, which column
pruning keeps proportional to the embedding column itself.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def _to_double(x: Column) -> Column:
    return x.cast("double")


def dot_product(a: Column | str, b: Column | str) -> Column:
    """Left-to-right double-precision fold of elementwise products."""
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    prod = F.zip_with(a, b, lambda x, y: _to_double(x) * _to_double(y))
    return F.aggregate(prod, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    sq = F.transform(a, lambda x: _to_double(x) * _to_double(x))
    return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, x: acc + x))


def l2_distance(a: Column | str, b: Column | str) -> Column:
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    d = F.zip_with(a, b, lambda x, y: (_to_double(x) - _to_double(y)) ** 2)
    return F.sqrt(F.aggregate(d, F.lit(0.0), lambda acc, x: acc + x))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_distance(a: Column | str, b: Column | str) -> Column:
    """Reference metric: `_distance` in [0, 2], score = 1 - _distance."""
    return F.lit(1.0) - cosine_similarity(a, b)


_METRICS = {
    "cosine": cosine_distance,
    "l2": l2_distance,
    "dot": lambda a, b: -dot_product(a, b),  # larger dot = closer → negate
}


def distance_expr(metric: str, a: Column | str, b: Column | str) -> Column:
    try:
        return _METRICS[metric](a, b)
    except KeyError:
        raise ValueError(f"unknown metric {metric!r}; one of {sorted(_METRICS)}")


def query_vector_lit(vec) -> Column:
    """A query vector as a literal array<double> column (Catalyst folds it
    into codegen — the reference achieves the same by executing a scalar
    subquery to a literal, demo.ipynb c11:10)."""
    return F.array(*[F.lit(float(v)) for v in vec])
