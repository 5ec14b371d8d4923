"""One-shot validation of tools/triangle_oracle_draft.sql against
operators/graph.py::triangle_count on the co-purchase graph — the same
rows+multiset compare tools/oracle_check.py applies to declared
queries. Usage: python tools/validate_triangle_draft.py [sf_dir ...]"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402


def main() -> None:
    dirs = sys.argv[1:] or ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
    from pyspark.sql import functions as F

    from pydata_vector_search_spark.operators.graph import triangle_count
    from pydata_vector_search_spark.session import get_spark

    spark = get_spark("triangle_draft")
    spark.sparkContext.setLogLevel("ERROR")
    # promoted in r10: the declared oracle constant IS the draft SQL —
    # validate the live copy so the two can never diverge
    from __spark_entry__ import _TRIANGLE_ORACLE_SQL as sql
    for d in dirs:
        li = spark.read.parquet(f"{d}/lineitem.parquet")
        a = li.select("l_orderkey", F.col("l_partkey").alias("u"))
        b = li.select("l_orderkey", F.col("l_partkey").alias("v"))
        pairs = (a.join(b, "l_orderkey")
                 .filter(F.col("u") < F.col("v"))
                 .select("u", "v").distinct())
        got = sorted(map(tuple, triangle_count(pairs, src="u", dst="v")
                         .collect()))
        con = duckdb.connect()
        con.execute(f"CREATE VIEW lineitem AS SELECT * FROM "
                    f"read_parquet('{d}/lineitem.parquet')")
        want = sorted(map(tuple, con.execute(sql).fetchall()))
        assert got == want, (
            f"{d}: MISMATCH rows {len(got)} vs {len(want)}; "
            f"first diff {next((g, w) for g, w in zip(got, want) if g != w)}")
        print(f"{d}: EXACT over {len(got)} nodes, "
              f"{sum(r[2] for r in got) // 3} triangles")


if __name__ == "__main__":
    main()
