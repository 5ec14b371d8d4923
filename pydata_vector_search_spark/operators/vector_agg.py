"""Vector AGGREGATION — elementwise mean/sum of embedding columns per
group, a genuine Spark gap (no built-in array-elementwise aggregate).

Uses: label/cluster centroids ("the average embedding of each class"),
per-source drift monitoring, building query vectors from exemplar sets,
re-training IVF seeds from live data.

Plan shape (the scalable formulation): ``posexplode`` the vector →
(group, pos, value) rows → ONE hash aggregate on (group, pos) — partial
aggregation combines map-side, so shuffled bytes are groups × dim
regardless of corpus size — → re-assemble the array with
``array_sort(collect_list(struct(pos, m)))`` + ``transform`` (the sort
key makes collect_list's nondeterministic arrival order irrelevant).
Everything is Catalyst built-ins; no UDAF, no Python.

The alternative per-row ``F.aggregate`` fold over a zip of arrays can
SUM two vectors but cannot express a grouped aggregate; a pandas UDAF
could, at Arrow-transfer cost ~10× this plan on 64-dim fixtures.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _assemble(per_pos: DataFrame, group_by: list[str], measure: str,
              out_col: str) -> DataFrame:
    arr = F.transform(
        F.array_sort(F.collect_list(F.struct(F.col("__pos"),
                                             F.col(measure)))),
        lambda s: s[measure])
    return per_pos.groupBy(*group_by).agg(arr.alias(out_col))


def mean_vector(df: DataFrame, group_by: list[str], vector_col: str,
                out_col: str = "centroid") -> DataFrame:
    """Per-group elementwise MEAN of ``vector_col`` → (group_by…,
    out_col array<double>). NULL vectors are skipped entirely (posexplode
    emits nothing); ragged dimensions would silently mix positions — feed
    fixed-dim columns."""
    ex = df.select(*group_by,
                   F.posexplode(vector_col).alias("__pos", "__v"))
    per = (ex.groupBy(*group_by, "__pos")
             .agg(F.avg("__v").alias("__m")))
    return _assemble(per, group_by, "__m", out_col)


def sum_vector(df: DataFrame, group_by: list[str], vector_col: str,
               out_col: str = "vec_sum") -> DataFrame:
    """Per-group elementwise SUM — the additive form (combine partial
    centroids across batches: sum/count pairs merge exactly where means
    do not)."""
    ex = df.select(*group_by,
                   F.posexplode(vector_col).alias("__pos", "__v"))
    per = (ex.groupBy(*group_by, "__pos")
             .agg(F.sum("__v").alias("__m")))
    return _assemble(per, group_by, "__m", out_col)
