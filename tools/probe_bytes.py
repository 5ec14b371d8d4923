"""Probe byte-cost accounting for the IVF int8 tier (VERDICT r2 #9).

Builds the IVF index over the sf embeddings table, then reports — from
parquet column-chunk metadata, i.e. the bytes a pruned columnar scan
actually reads — the ranking-pass cost of the float probe (embedding
column) vs the int8 probe (__q8 + __q8scale columns), plus wall-clock
for both probe paths and their result agreement.

Usage: python tools/probe_bytes.py [sf_dir]   (default /root/testdata/sf0.1)
Results are recorded in README.md.
"""

from __future__ import annotations

import glob
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def column_bytes(data_path: str) -> dict[str, int]:
    import pyarrow.parquet as pq

    out: dict[str, int] = {}
    for f in glob.glob(data_path + "/**/*.parquet", recursive=True):
        md = pq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                root = col.path_in_schema.split(".")[0]
                out[root] = out.get(root, 0) + col.total_compressed_size
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from pydata_vector_search_spark.operators import ann
    from pydata_vector_search_spark.session import get_spark

    spark = get_spark("probe_bytes")
    spark.sparkContext.setLogLevel("ERROR")

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    path = tempfile.mkdtemp(prefix="pvss_probe_bytes_")
    idx = ann.ivf_build(emb, "embedding", path, num_centroids=8, seed=42)

    cb = column_bytes(idx.data_path)
    f32 = cb.get("embedding", 0)
    q8 = cb.get("__q8", 0) + cb.get("__q8scale", 0)
    print(f"ranking-pass bytes  float32: {f32:>10,}  "
          f"int8: {q8:>10,}  ratio: {f32 / q8:.2f}x")

    qv = [float(x) for x in emb.head().embedding]
    t0 = time.perf_counter()
    a = [r.vec_id for r in ann.ivf_search(
        spark, idx, qv, k=10, nprobe=8, tiebreaker="vec_id").collect()]
    t_f32 = time.perf_counter() - t0
    t0 = time.perf_counter()
    b = [r.vec_id for r in ann.ivf_search_int8(
        spark, idx, qv, "vec_id", k=10, nprobe=8, refine=8,
        tiebreaker="vec_id").collect()]
    t_q8 = time.perf_counter() - t0
    print(f"probe wall-clock    float32: {t_f32:.2f}s  int8: {t_q8:.2f}s  "
          f"top-10 identical: {a == b}")


if __name__ == "__main__":
    main()
