"""Deterministic grouped top-n / balanced sampling at whale-group scale.

A grouped top-n is usually spelled as one window:
``row_number() OVER (PARTITION BY g ORDER BY ...) <= n``. That plan is
correct but puts EVERY row of a group through ONE task — the per-group
twin of the unpartitioned-WindowExec failure ``select_token_budget``
engineers around. At 100 TB a whale group (one giant k-means cluster,
one boilerplate-heavy domain) is a guaranteed straggler/OOM.

``top_n_per_group`` runs the same selection as a TWO-LEVEL TOURNAMENT:

1. each row gets a deterministic salt ``xxhash64(id) % salt_buckets``;
   a first window partitioned by (group, salt) keeps each bucket's
   local top-n — every task sees ~|group|/salt_buckets rows;
2. a second window partitioned by group re-ranks the surviving
   ``<= salt_buckets * n`` rows per group and keeps the global top-n.

Any row of the true global top-n is top-n within its salt bucket, so
level 1 never drops a winner — the result is EXACTLY the single-window
spelling (pinned by tests), which is also what a declared query's
DuckDB oracle runs. The caller supplies a TOTAL order (tie-break on a
unique id) — the same determinism contract every declared query obeys.

MEASURED trade (tools/scale_probe.py `topn`, plus a 50M-row synthetic
whale): on local[32] the single-task window WINS at every probed size
(50M rows in one group: single window 6.2 s vs tournament 9.6 s) — a
one-task external sort of 50M rows fits a 128 GB box comfortably, and
the tournament pays an extra salt column + exchange for insurance it
doesn't need there. What the tournament buys is the BOUND, not local
speed: per-task input is |group|/salt_buckets by construction, so a
group that exceeds one task's sort/memory budget (the billions-of-rows
whale a 100 TB corpus produces) degrades to more tasks instead of one
straggling/OOMing task — the same contract-over-local-speed choice as
``select_token_budget``'s forced-distributed branch. Pick
``salt_buckets=1`` when groups are known task-sized.

``cluster_sample`` composes this with the integer-exact k-means:
cluster-balanced subsampling (keep ``per_cluster`` docs per semantic
cluster, ranked by the md5 hash of their id — a seedless, partition-
independent uniform draw), the selection step SemDeDup-style curation
pipelines run after clustering. The reference has no sampling surface
(single-table vector-search demo, demo.ipynb c0:4) — LLM-data-pipeline
mandate surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def top_n_per_group(df: DataFrame, group_cols, order_by, n: int,
                    id_col: str | None = None,
                    salt_buckets: int = 16) -> DataFrame:
    """Keep each group's top ``n`` rows under ``order_by`` (a list of
    Columns/names forming a TOTAL order). Identical output to the
    single-window spelling; executes as the salted tournament above.
    ``id_col`` drives the salt (required when ``salt_buckets > 1``);
    ``salt_buckets=1`` degrades to the plain single window — the right
    choice when groups are known small."""
    if n < 1:
        raise ValueError(f"top_n_per_group: n must be >= 1, got {n}")
    if salt_buckets < 1:
        raise ValueError(f"top_n_per_group: salt_buckets must be >= 1, "
                         f"got {salt_buckets}")
    gcols = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    ocols = [F.col(c) if isinstance(c, str) else c for c in
             ([order_by] if isinstance(order_by, str) else list(order_by))]
    if salt_buckets == 1:
        w = Window.partitionBy(*gcols).orderBy(*ocols)
        return (df.withColumn("__rn", F.row_number().over(w))
                  .filter(F.col("__rn") <= n).drop("__rn"))
    if id_col is None:
        raise ValueError("top_n_per_group: id_col is required for the "
                         "salted path (salt_buckets > 1)")
    salt = F.pmod(F.xxhash64(F.col(id_col).cast("string")),
                  F.lit(salt_buckets)).cast("int")
    w1 = Window.partitionBy(*gcols, F.col("__salt")).orderBy(*ocols)
    w2 = Window.partitionBy(*gcols).orderBy(*ocols)
    return (df.withColumn("__salt", salt)
              .withColumn("__rn1", F.row_number().over(w1))
              .filter(F.col("__rn1") <= n)
              .withColumn("__rn2", F.row_number().over(w2))
              .filter(F.col("__rn2") <= n)
              .drop("__salt", "__rn1", "__rn2"))


def cluster_sample(df: DataFrame, vector_col: str, id_col: str,
                   k: int = 8, iterations: int = 3,
                   per_cluster: int = 100, salt_buckets: int = 16,
                   scale: int = 10 ** 6,
                   offset: float = 1.0) -> DataFrame:
    """Cluster-balanced subsample: integer-exact k-means over
    ``vector_col``, then ``per_cluster`` rows per cluster ranked by
    ``(md5(id), id)`` — a deterministic uniform draw reproducible under
    any partitioning and in any engine (md5 is the cross-engine hash
    family). Returns the sampled rows + ``cluster_id`` +
    ``dist_units``. One Arrow argmin pass + the two tournament windows;
    nothing group-sized ever sits in one task."""
    from pydata_vector_search_spark.operators.clustering import (
        kmeans_assign, kmeans_train)

    model = kmeans_train(df, vector_col, id_col, k=k,
                         iterations=iterations, scale=scale, offset=offset)
    assigned = kmeans_assign(df, model, vector_col)
    order = [F.md5(F.col(id_col).cast("string")), F.col(id_col)]
    return top_n_per_group(assigned, "cluster_id", order, per_cluster,
                           id_col=id_col, salt_buckets=salt_buckets)
