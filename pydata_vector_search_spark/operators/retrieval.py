"""Lexical retrieval (BM25) + rank fusion — the keyword half of hybrid
search.

The reference is a pure vector-search stack (hudi_vector_search TVF,
demo.ipynb c11); production retrieval pairs that with lexical scoring and
fuses the two rankings (the standard hybrid pattern Lucene/Elasticsearch
/ Vespa ship as "BM25 + ANN"). This module adds the lexical side
Spark-first:

* ``bm25_search`` — Okapi BM25 (Robertson & Sparck Jones; the
  Lucene-style idf+1 variant, non-negative) as ONE declarative plan:
  explode tokens → broadcast-join the query terms (the corpus never
  shuffles on anything wider than (doc, term)) → per-(doc,term) partial
  score → integer-exact sum → TakeOrderedAndProject top-k.
* ``rrf_fuse`` — Reciprocal Rank Fusion (Cormack, Clarke & Buettcher,
  SIGIR'09): score = Σ 1/(k0 + rank_i) over the input rankings; the
  robust parameter-free fusion used for BM25+vector hybrids.

Determinism contract (oracle-hashable): per-(doc,term) BM25 partials are
scaled by 1e6 and floored to BIGINT before the per-doc sum — integer
addition is order-independent, so the score never depends on partition
order; both engines then divide the identical integer by 1e6. Ranks are
row_number over (score desc, id asc).

Scale notes (100 TB): the query-term table is tiny by definition —
broadcast; token explode is scan-local; the only shuffle is the
(doc,term)→doc aggregate, bounded by |docs|·|terms|. Corpus stats (N,
Σdl) and per-term document frequencies are single-row / |terms|-row
aggregates broadcast back into the scoring join. Nothing is ever
collected to the driver.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F

from pydata_vector_search_spark.operators.dedup import tokens_col

_SCALE = 1_000_000


def bm25_search(df: DataFrame, text_col: str, id_col: str,
                query_terms: Sequence[str], k: int = 10,
                k1: float = 1.2, b: float = 0.75) -> DataFrame:
    """Top-``k`` documents by Okapi BM25 for a bag of ``query_terms``.

    Returns (id, bm25) ordered by (bm25 desc, id asc); ``bm25`` is the
    integer-exact score (see module docstring). idf is the Lucene
    ``ln(1 + (N - df + 0.5)/(df + 0.5))`` form — always positive, so a
    term occurring in most documents down-weights instead of flipping
    the ranking sign."""
    spark = df.sparkSession
    terms = spark.createDataFrame([(t,) for t in dict.fromkeys(query_terms)],
                                  "term string")

    toks = df.select(F.col(id_col).alias("__id"),
                     tokens_col(text_col).alias("__toks"))
    ex = toks.select("__id", F.size("__toks").alias("__dl"),
                     F.explode("__toks").alias("term"))
    hits = (ex.join(F.broadcast(terms), "term")
              .groupBy("__id", "term")
              .agg(F.count(F.lit(1)).cast("double").alias("__tf"),
                   F.min("__dl").cast("double").alias("__dl")))

    dfreq = (hits.groupBy("term")
                 .agg(F.count(F.lit(1)).cast("double").alias("__df")))
    stats = toks.agg(F.count(F.lit(1)).cast("double").alias("__n"),
                     F.sum(F.size("__toks")).cast("double").alias("__sumdl"))

    idf = F.log(F.lit(1.0) + (F.col("__n") - F.col("__df") + 0.5)
                / (F.col("__df") + 0.5))
    denom = (F.col("__tf")
             + k1 * (1 - b + b * F.col("__dl") * F.col("__n")
                     / F.col("__sumdl")))
    partial = idf * F.col("__tf") * (k1 + 1) / denom
    # integer-exact partials: floor(s*1e6 + .5) — order-independent sum
    p_int = F.floor(partial * _SCALE + F.lit(0.5)).cast("long")

    scored = (hits.join(F.broadcast(dfreq), "term")
                  .crossJoin(F.broadcast(stats))
                  .withColumn("__p", p_int)
                  .groupBy("__id")
                  .agg((F.sum("__p") / F.lit(float(_SCALE))).alias("bm25")))
    return (scored.select(F.col("__id").alias(id_col), "bm25")
                  .orderBy(F.col("bm25").desc(), F.col(id_col).asc())
                  .limit(k))


def rrf_fuse(a: DataFrame, b: DataFrame, id_col: str,
             k0: int = 60, k: int = 10,
             a_order: Sequence | None = None,
             b_order: Sequence | None = None) -> DataFrame:
    """Reciprocal Rank Fusion of two rankings (SIGIR'09): fused score =
    1/(k0 + rank_a) + 1/(k0 + rank_b), a list absent from one ranking
    contributes only its present term. ``a_order``/``b_order`` give the
    explicit (already deterministic) ordering columns; default = the
    input's existing second column desc, id asc.

    The fused expression is written as a fixed two-term sum of exact
    integer-ranked reciprocals — no aggregation order dependence — and
    rounded to 6 so the oracle can replay it bit-for-bit.

    The global row_number windows here are intentional: inputs are
    ALREADY k-truncated rank lists (top-N from bm25_search /
    vector_search), so each window sorts ≤N rows on one task — never
    the corpus."""
    def _rank(df: DataFrame, order) -> DataFrame:
        if order is None:
            score_col = [c for c in df.columns if c != id_col][0]
            order = [F.col(score_col).desc(), F.col(id_col).asc()]
        w = Window.orderBy(*order)
        return (df.withColumn("__r", F.row_number().over(w).cast("long"))
                  .select(id_col, "__r"))

    ra = _rank(a, a_order).withColumnRenamed("__r", "__ra")
    rb = _rank(b, b_order).withColumnRenamed("__r", "__rb")
    j = ra.join(rb, id_col, "full_outer")
    fused = F.round(
        F.coalesce(F.lit(1.0) / (F.lit(float(k0)) + F.col("__ra")),
                   F.lit(0.0))
        + F.coalesce(F.lit(1.0) / (F.lit(float(k0)) + F.col("__rb")),
                     F.lit(0.0)), 6)
    return (j.select(id_col, fused.alias("rrf"),
                     F.col("__ra").alias("rank_lex"),
                     F.col("__rb").alias("rank_vec"))
             .orderBy(F.col("rrf").desc(), F.col(id_col).asc())
             .limit(k))


def mmr_rerank(hits: DataFrame, id_col: str, vector_col: str,
               query_vec, k: int = 10, lamb: float = 0.5,
               round_sims: int | None = None) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein,
    SIGIR'98): greedily pick the candidate maximizing
    ``λ·sim(q,d) − (1−λ)·max_{s∈selected} sim(d,s)`` — the standard
    diversification pass over a retrieval shortlist (near-duplicate hits
    stop crowding out distinct results; λ=1 degenerates to plain
    similarity order).

    Deliberately DRIVER-SIDE: the input contract is an already
    k-truncated candidate list (the top-N of vector_search / pq_search /
    rrf_fuse — tens of rows), and the greedy recurrence is inherently
    sequential; a distributed spelling would serialize through N tiny
    jobs instead of N² trivial float ops. Ties break on ascending id.
    Returns (id, mmr_rank, mmr_score) for the selected k; the id column
    keeps the input's native type.

    ``round_sims``: round every relevance/redundancy cosine to this many
    decimals BEFORE the greedy recurrence. With e.g. 9 decimals the
    selection becomes exactly replayable by another engine (last-ulp
    dot-product divergence between BLAS and SQL sum orders can no longer
    flip an argmax — any two distinct rounded scores differ by ≥λ·1e-9,
    far above the 1e-12 tie window) at a quality cost far below
    embedding noise. The declared oracle query uses this contract."""
    import numpy as np

    id_type = hits.schema[id_col].dataType
    from pyspark.sql.types import (DoubleType, LongType, StructField,
                                   StructType)
    out_schema = StructType([StructField(id_col, id_type),
                             StructField("mmr_rank", LongType()),
                             StructField("mmr_score", DoubleType())])

    rows = hits.select(id_col, vector_col).collect()
    if not rows:
        return hits.sparkSession.createDataFrame([], out_schema)
    ids = [r[0] for r in rows]
    V = np.stack([np.asarray(r[1], dtype=np.float64) for r in rows])
    V /= np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
    q = np.asarray(list(query_vec), dtype=np.float64)
    q /= max(np.linalg.norm(q), 1e-12)
    rel = V @ q
    sim = V @ V.T
    if round_sims is not None:
        rel = np.round(rel, round_sims)
        sim = np.round(sim, round_sims)

    selected: list[int] = []
    out = []
    cand = list(range(len(ids)))
    # deterministic: sort candidate scan order by (relevance desc, id asc)
    cand.sort(key=lambda i: (-rel[i], ids[i]))
    while cand and len(selected) < k:
        best, best_score = None, None
        for i in cand:
            red = max((sim[i][j] for j in selected), default=0.0)
            s = lamb * rel[i] - (1 - lamb) * red
            if best is None or s > best_score + 1e-12:
                best, best_score = i, s
        selected.append(best)
        cand.remove(best)
        out.append((ids[best], len(selected), float(best_score)))
    return hits.sparkSession.createDataFrame(out, out_schema)
