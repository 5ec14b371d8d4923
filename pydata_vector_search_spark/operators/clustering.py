"""Integer-exact Lloyd's k-means over embedding columns, plus the
paper-faithful SemDeDup composition built on it.

SemDeDup (Abbas et al., "SemDeDup: Data-efficient learning at
web-scale through semantic deduplication", arXiv:2303.09540) clusters
with k-means and prunes within clusters; ``dedup.semantic_dedup``
ships a deterministic hyperplane-LSH stand-in for the clustering
step. This module supplies the paper's actual primitive, built so
every engine reproduces identical integers (the ``pagerank_exact`` /
bm25 / lm_score fixed-point discipline):

* coordinates are quantized as ``floor((x + offset) * scale)`` longs.
  The ``offset`` (default 1.0) keeps every quantized coordinate
  POSITIVE for inputs in ``(-offset, inf)``, so Spark's truncating
  ``div`` and DuckDB's ``//`` agree on the centroid means — they
  differ on negatives (trunc-toward-zero vs floor), the same trap
  ``pagerank_exact`` dodges by carrying only positive mass. Squared
  L2 distances are offset-invariant, so the clustering itself is
  unchanged by the shift.
* assignment is argmin of EXACT int64 squared L2, ties broken to the
  lowest cluster id; the centroid update is the per-dimension integer
  mean ``sum // count``; an EMPTY cluster keeps its previous
  centroid (deterministic and SQL-replayable via a left join).
* ``iterations`` is fixed — no convergence test. A fixed iteration
  count is what a DuckDB unrolled-CTE oracle can replay bit-for-bit
  (a recursive CTE cannot: each round references the previous
  centroids twice — once to assign, once as the empty-cluster
  fallback — and recursive CTEs allow a single reference).

Scale shape (100 TB): the model is k*d longs — it rides in the task
closure (4 KB at k=8, d=64; no broadcast machinery needed, and
``kmeans_train`` raises before building a model that would not fit a
closure). Assignment is ONE Arrow-batched numpy pass — O(n*k*d)
int64 ops computed per-centroid so the intermediate stays n*d, no
shuffle at all. The centroid update is posexplode + hash aggregate:
partial aggregation combines map-side, so the shuffle carries
``partitions * k * d`` rows, never ``n * d`` (the
``vector_agg.sum_vector`` contract), and the driver collects k*d
(sum, count) longs per iteration — metadata-sized by construction.
The training input is projected to (id, vector) and
``localCheckpoint``'ed once: 2*iterations + 1 consumers otherwise
re-run the upstream lineage every round (the pagerank barrier
lesson — 75.6 s -> 20.6 s at the 10x probe).

The reference has no clustering surface at all (single-table vector
search, demo.ipynb c0:4) — this is LLM-data-pipeline mandate surface:
SemDeDup, cluster-balanced sampling, and IVF-style partitioning all
start from a k-means.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf

_SCALE = 10 ** 6
# k*d beyond this no longer "rides in the task closure" honestly —
# callers wanting huge models should shard assignment differently.
_MAX_MODEL_CELLS = 1 << 22


@dataclass(frozen=True)
class KMeansModel:
    """k x d quantized-integer centroids + the quantization params
    needed to score new vectors identically."""
    centroids: tuple[tuple[int, ...], ...]
    scale: int
    offset: float

    @property
    def k(self) -> int:
        return len(self.centroids)

    @property
    def dim(self) -> int:
        return len(self.centroids[0]) if self.centroids else 0


def _quant_scalar(col: F.Column, scale: int, offset: float) -> F.Column:
    """JVM-codegen quantizer for an exploded scalar coordinate —
    bit-identical to the numpy spelling in ``_assigner`` (float ->
    double widening is exact; +offset, *scale, floor are IEEE-double
    deterministic in both engines and in DuckDB's
    ``floor((x::DOUBLE + offset) * scale)``)."""
    return F.floor((col.cast("double") + F.lit(float(offset)))
                   * F.lit(float(scale))).cast("long")


def _quant_py(vec, scale: int, offset: float) -> tuple[int, ...]:
    return tuple(int(math.floor((float(x) + offset) * scale))
                 for x in vec)


def _assigner(centroids, scale: int, offset: float):
    """Arrow-batched argmin over exact int64 squared L2. Per-centroid
    loop keeps the live intermediate at n*d int64 (never n*k*d);
    ties go to the LOWEST cluster id (strict < update). Raises on a
    negative quantized coordinate — the positive-domain contract the
    integer mean depends on (see module docstring)."""
    import numpy as np
    import pandas as pd

    C = np.asarray(centroids, dtype=np.int64)

    def assign(vs):    # pd.Series -> pd.DataFrame (struct rows); no type
        # hints — the hint parser has no Series->DataFrame signature
        if len(vs) == 0:
            return pd.DataFrame({"cluster_id": pd.array([], dtype="int32"),
                                 "dist_units": pd.array([], dtype="int64")})
        if vs.isna().any():
            raise ValueError("kmeans: NULL vector — drop or impute NULL "
                             "rows before clustering (posexplode would "
                             "silently skip them in training while "
                             "assignment cannot place them)")
        lens = vs.map(len)
        if (lens != C.shape[1]).any():
            raise ValueError(f"kmeans: ragged vector (len "
                             f"{int(lens[lens != C.shape[1]].iloc[0])} vs "
                             f"model dim {C.shape[1]}) — fixed-dim "
                             "columns only")
        X = np.stack(vs.to_numpy()).astype(np.float64)
        Q = np.floor((X + float(offset)) * float(scale)).astype(np.int64)
        if (Q < 0).any():
            raise ValueError(
                "kmeans: quantized coordinate < 0 — input has values "
                f"<= -{offset}; raise `offset` (integer centroid means "
                "require a positive domain)")
        best_d = None
        best_c = None
        for ci in range(C.shape[0]):
            diff = Q - C[ci]
            d = np.einsum("ij,ij->i", diff, diff)
            if best_d is None:
                best_d = d
                best_c = np.zeros(len(d), dtype=np.int32)
            else:
                upd = d < best_d
                best_d = np.where(upd, d, best_d)
                best_c = np.where(upd, np.int32(ci), best_c)
        return pd.DataFrame({"cluster_id": best_c,
                             "dist_units": best_d.astype(np.int64)})

    return pandas_udf(assign, "cluster_id int, dist_units long")


def kmeans_train(df: DataFrame, vector_col: str, id_col: str,
                 k: int = 8, iterations: int = 3, scale: int = _SCALE,
                 offset: float = 1.0) -> KMeansModel:
    """Fixed-iteration integer Lloyd's k-means. Init is the k rows
    with the SMALLEST ids (deterministic, engine-independent — the
    exact_dedup canonical-keep rule applied to seeding); cluster id =
    seed rank. Returns the model only; score with ``kmeans_assign``."""
    if k < 1:
        raise ValueError(f"kmeans_train: k must be >= 1, got {k}")
    if iterations < 0:
        raise ValueError(f"kmeans_train: iterations must be >= 0, "
                         f"got {iterations}")
    src = (df.select(F.col(id_col).alias("__id"),
                     F.col(vector_col).alias("__v"))
             .localCheckpoint(eager=True))
    seeds = src.orderBy("__id").limit(k).collect()
    if len(seeds) < k:
        raise ValueError(f"kmeans_train: k={k} but input has only "
                         f"{len(seeds)} rows")
    if any(r["__v"] is None for r in seeds):
        raise ValueError("kmeans_train: NULL vector among the seed rows — "
                         "drop or impute NULL rows before clustering")
    cents = [_quant_py(r["__v"], scale, offset) for r in seeds]
    dim = len(cents[0])
    if any(len(c) != dim for c in cents):
        raise ValueError("kmeans_train: ragged seed vectors — fixed-dim "
                         "columns only")
    if k * dim > _MAX_MODEL_CELLS:
        raise ValueError(f"kmeans_train: k*dim = {k * dim} exceeds the "
                         f"closure-safe bound {_MAX_MODEL_CELLS}")
    for _ in range(iterations):
        assign = _assigner(cents, scale, offset)
        assigned = src.select(
            assign(F.col("__v")).getField("cluster_id").alias("__cid"),
            F.col("__v"))
        # posexplode + hash agg: partial aggregation combines map-side,
        # so the shuffle and this collect are k*d-sized, not n*d.
        sums = (assigned
                .select("__cid", F.posexplode("__v").alias("__pos", "__x"))
                .withColumn("__q", _quant_scalar(F.col("__x"), scale,
                                                 offset))
                .groupBy("__cid", "__pos")
                .agg(F.sum("__q").alias("__s"),
                     F.count(F.lit(1)).alias("__n"))
                .collect())
        per: dict[int, list[int]] = {}
        cnt: dict[int, int] = {}
        for r in sums:
            if r["__s"] < 0:
                raise ValueError("kmeans_train: negative coordinate sum — "
                                 "positive-domain contract violated")
            per.setdefault(r["__cid"], [0] * dim)[r["__pos"]] = r["__s"]
            cnt[r["__cid"]] = r["__n"]
        cents = [tuple(s // cnt[ci] for s in per[ci]) if ci in per
                 else cents[ci]              # empty cluster: keep previous
                 for ci in range(k)]
    return KMeansModel(tuple(cents), scale, offset)


def kmeans_assign(df: DataFrame, model: KMeansModel,
                  vector_col: str) -> DataFrame:
    """One Arrow-batched pass: ``df`` + ``cluster_id`` (int, argmin,
    ties to the lowest id) + ``dist_units`` (long, exact int64 squared
    L2 in quantized units). No shuffle."""
    assign = _assigner(model.centroids, model.scale, model.offset)
    a = assign(F.col(vector_col))
    return (df.withColumn("__a", a)
              .withColumn("cluster_id", F.col("__a.cluster_id"))
              .withColumn("dist_units", F.col("__a.dist_units"))
              .drop("__a"))


def kmeans_neardup_pairs(df: DataFrame, vector_col: str, id_col: str,
                         k: int = 8, iterations: int = 3,
                         threshold: float = 0.8, round_to: int = 6,
                         scale: int = _SCALE,
                         offset: float = 1.0) -> DataFrame:
    """Within-cluster rounded-cosine pairs >= threshold — SemDeDup's
    candidate structure with its real k-means clusters. One shuffle on
    ``cluster_id``, then the hyperplane-LSH verify shape verbatim: a
    single numpy matmul per cluster (dedup.py:872 — the join spelling
    measured 27 s vs 0.6 s there because the O(dim) cosine lands
    outside codegen per candidate pair). Per-task memory is
    (cluster size)^2 doubles — ``k`` is the memory knob, exactly the
    paper's "k large enough that clusters fit" contract; recall is
    cluster-bounded (cross-cluster near-dups are unseen), with the
    brute ``cosine_threshold_pairs`` as the recall reference."""
    import numpy as np
    import pandas as pd

    model = kmeans_train(df, vector_col, id_col, k=k,
                         iterations=iterations, scale=scale, offset=offset)
    base = (kmeans_assign(
                df.select(F.col(id_col).alias("__id"),
                          F.col(vector_col).alias("__v")),
                model, "__v")
            .select("__id", "__v", "cluster_id"))

    id_type = df.schema[id_col].dataType.simpleString()
    out_schema = f"id_1 {id_type}, id_2 {id_type}, cos_sim double"
    rscale = 10 ** round_to
    _EMPTY = pd.DataFrame({"id_1": [], "id_2": [], "cos_sim": []})

    def _verify(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < 2:
            return _EMPTY
        ids = pdf["__id"].to_numpy()
        V = np.stack(pdf["__v"].to_numpy()).astype(np.float64)
        n = np.linalg.norm(V, axis=1, keepdims=True)
        V /= np.where(n == 0, 1.0, n)
        iu, ju = np.triu_indices(len(ids), 1)
        sims = (V @ V.T)[iu, ju]
        I, J = ids[iu], ids[ju]
        id1, id2 = np.minimum(I, J), np.maximum(I, J)
        # half away from zero, matching Spark ROUND
        sims = np.sign(sims) * np.floor(np.abs(sims) * rscale + 0.5) / rscale
        keep = sims >= threshold
        return pd.DataFrame({"id_1": id1[keep], "id_2": id2[keep],
                             "cos_sim": sims[keep]})

    return base.groupBy("cluster_id").applyInPandas(_verify,
                                                    schema=out_schema)


def semantic_dedup_kmeans(df: DataFrame, vector_col: str, id_col: str,
                          k: int = 8, iterations: int = 3,
                          threshold: float = 0.8, round_to: int = 6,
                          scale: int = _SCALE, offset: float = 1.0,
                          max_iter: int = 25) -> DataFrame:
    """SemDeDup with its actual k-means clustering (the
    ``dedup.semantic_dedup`` semantics with the paper's partitioner):
    within-cluster rounded-cosine pairs form the semantic-dup graph,
    connected components collapse transitive groups, the min-id member
    survives. Returns the surviving rows of ``df``. Requires an
    INTEGRAL ``id_col`` — ``connected_components`` labels are longs
    and raises on anything else (``kmeans_neardup_pairs`` alone
    accepts arbitrary id types; the components routing does not).
    Scale notes: pair generation one cluster-key shuffle (above);
    components O(log n) pointer-jump rounds (operators/graph); the
    doomed side is dup-count-sized, left to AQE's runtime broadcast
    decision."""
    from pydata_vector_search_spark.operators.graph import \
        connected_components

    pairs = kmeans_neardup_pairs(df, vector_col, id_col, k=k,
                                 iterations=iterations,
                                 threshold=threshold, round_to=round_to,
                                 scale=scale, offset=offset)
    comps = connected_components(pairs, src="id_1", dst="id_2",
                                 max_iter=max_iter)
    doomed = (comps.filter(F.col("node") != F.col("component"))
                   .select(F.col("node").alias("__doomed")))
    return df.join(doomed, df[id_col] == F.col("__doomed"), "left_anti")
