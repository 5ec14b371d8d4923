"""VALIDATED r10 declaration draft: DuckDB oracle for a `kmeans_assign`
query — integer-exact Lloyd's k-means replayed as an unrolled CTE chain.

``build_kmeans_oracle_sql`` emits ONE query reproducing
operators/clustering.py::kmeans_train + kmeans_assign bit-for-bit (the
pagerank_exact unrolled-replay discipline — a recursive CTE cannot
express the recurrence because each round references the previous
centroids twice: assignment AND the empty-cluster fallback). Per
iteration: quantized squared-L2 cross join -> row_number argmin with
(dist, cid) tie-break -> per-dimension integer mean with a LEFT JOIN
COALESCE for empty clusters. The +1.0 offset keeps every quantized
coordinate positive so DuckDB `//` and Spark `div` agree (they differ
on negatives). Note the `CAST(x AS DOUBLE)` inside the quantizer
lambda — DuckDB narrows float*double-literal to FLOAT32 otherwise
(the recorded off-by-one class in SKILL.md).

Run as a script to validate against the Spark operator:
    python tools/kmeans_oracle_draft.py [sf_dir ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_kmeans_oracle_sql(k: int = 8, iterations: int = 3,
                            scale: int = 10 ** 6, offset: float = 1.0,
                            table: str = "embeddings",
                            vec_col: str = "embedding",
                            id_col: str = "vec_id") -> str:
    """Promoted to __spark_entry__._kmeans_oracle_sql in r10 (the
    declared `kmeans` query) — this wrapper delegates so the draft
    validator and the declared oracle can never diverge."""
    assert (table, vec_col, id_col) == ("embeddings", "embedding",
                                        "vec_id"), \
        "the promoted builder is fixed to the embeddings table"
    from __spark_entry__ import _kmeans_oracle_sql
    return _kmeans_oracle_sql(k=k, iterations=iterations, scale=scale,
                              offset=offset)


def build_cluster_sample_oracle_sql(k: int = 8, iterations: int = 3,
                                    per_cluster: int = 10,
                                    scale: int = 10 ** 6,
                                    offset: float = 1.0,
                                    table: str = "embeddings",
                                    vec_col: str = "embedding",
                                    id_col: str = "vec_id") -> str:
    """Promoted to __spark_entry__._cluster_sample_oracle_sql in r10
    (the declared `kmeans_sample` query) — delegating wrapper, see
    above."""
    assert (table, vec_col, id_col, scale, offset) == (
        "embeddings", "embedding", "vec_id", 10 ** 6, 1.0), \
        "the promoted builder is fixed to the embeddings-table defaults"
    from __spark_entry__ import _cluster_sample_oracle_sql
    return _cluster_sample_oracle_sql(k=k, iterations=iterations,
                                      per_cluster=per_cluster)


def build_semdedup_kmeans_oracle_sql(k: int = 8, iterations: int = 3,
                                     threshold: float = 0.3,
                                     round_to: int = 6,
                                     scale: int = 10 ** 6,
                                     offset: float = 1.0,
                                     table: str = "embeddings",
                                     vec_col: str = "embedding",
                                     id_col: str = "vec_id") -> str:
    """Promoted to __spark_entry__._semdedup_kmeans_oracle_sql in r11
    (the declared `semdedup_kmeans` query) — delegating wrapper so the
    draft validator and the declared oracle can never diverge."""
    assert (table, vec_col, id_col, scale, offset) == (
        "embeddings", "embedding", "vec_id", 10 ** 6, 1.0), \
        "the promoted builder is fixed to the embeddings-table defaults"
    from __spark_entry__ import _semdedup_kmeans_oracle_sql
    return _semdedup_kmeans_oracle_sql(k=k, iterations=iterations,
                                       threshold=threshold,
                                       round_to=round_to)


def main() -> None:
    import time

    import duckdb

    from pydata_vector_search_spark.operators.clustering import (
        kmeans_assign, kmeans_train)
    from pydata_vector_search_spark.session import get_spark

    dirs = sys.argv[1:] or ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
    spark = get_spark("kmeans_draft")
    spark.sparkContext.setLogLevel("ERROR")
    sql = build_kmeans_oracle_sql(k=8, iterations=3)
    for d in dirs:
        emb = spark.read.parquet(f"{d}/embeddings.parquet")
        model = kmeans_train(emb, "embedding", "vec_id", k=8, iterations=3)
        got = sorted((r.vec_id, r.cluster_id, r.dist_units) for r in
                     kmeans_assign(emb, model, "embedding")
                     .select("vec_id", "cluster_id", "dist_units")
                     .collect())
        con = duckdb.connect()
        con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                    f"read_parquet('{d}/embeddings.parquet')")
        t0 = time.perf_counter()
        want = sorted(map(tuple, con.execute(sql).fetchall()))
        dt = time.perf_counter() - t0
        assert got == want, (f"{d}: MISMATCH — {len(got)} spark vs "
                             f"{len(want)} duckdb rows; first diff: "
                             f"{next((a, b) for a, b in zip(got, want) if a != b)}")
        sizes = {}
        for _, c, _ in got:
            sizes[c] = sizes.get(c, 0) + 1
        print(f"{d}: EXACT — {len(got)} rows, duckdb {dt:.1f}s, "
              f"cluster sizes {dict(sorted(sizes.items()))}")

        from pydata_vector_search_spark.operators.sampling import \
            cluster_sample
        got_s = sorted((r.vec_id, r.cluster_id, r.dist_units) for r in
                       cluster_sample(emb, "embedding", "vec_id", k=8,
                                      iterations=3, per_cluster=10,
                                      salt_buckets=4)
                       .select("vec_id", "cluster_id", "dist_units")
                       .collect())
        want_s = sorted(map(tuple, con.execute(
            build_cluster_sample_oracle_sql(k=8, iterations=3,
                                            per_cluster=10)).fetchall()))
        assert got_s == want_s, f"{d}: SAMPLE MISMATCH"
        print(f"{d}: cluster_sample EXACT — {len(got_s)} sampled rows")

        from pydata_vector_search_spark.operators.clustering import \
            semantic_dedup_kmeans
        from pyspark.sql import functions as F
        surv = semantic_dedup_kmeans(emb, "embedding", "vec_id", k=8,
                                     iterations=3, threshold=0.3)
        got_d = sorted(tuple(r) for r in
                       surv.groupBy("label")
                           .agg(F.count(F.lit(1)).cast("long")
                                .alias("n_kept"),
                                F.sum("vec_id").cast("long")
                                .alias("id_sum"))
                           .collect())
        want_d = sorted(map(tuple, con.execute(
            build_semdedup_kmeans_oracle_sql(k=8, iterations=3,
                                             threshold=0.3)).fetchall()))
        assert got_d == want_d, f"{d}: SEMDEDUP MISMATCH"
        kept = sum(n for _, n, _ in got_d)
        print(f"{d}: semdedup_kmeans EXACT — {kept} survivors "
              f"across {len(got_d)} labels")


if __name__ == "__main__":
    main()
