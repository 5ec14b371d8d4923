"""VALIDATED r10 declaration draft: DuckDB oracle for a `bpe_train`
query — BPE vocabulary induction replayed step-by-step in SQL.

``build_bpe_oracle_sql`` emits ONE query that reproduces
operators/bpe.py::bpe_train bit-for-bit (the pagerank_exact
"unrolled-CTE replay" discipline): the word-frequency table (same
BPE_ISH_PATTERN pre-tokenization, same count-desc/word-asc cap), then
``num_merges`` unrolled stages of [adjacent-pair count → argmax with
(count desc, left, right) tie-break → per-word greedy LEFT-TO-RIGHT
merge application as a positional recursive CTE]. Early stop
(best < min_pair_count) cascades through empty CTEs, so the SQL stops
exactly where the operator stops.

Run as a script to validate against the Spark operator at sf0.001 and
sf0.01 with oracle_check's rows+multiset compare:
    python tools/bpe_oracle_draft.py [sf_dir ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_bpe_oracle_sql(num_merges: int = 12, min_count: int = 1,
                         min_pair_count: int = 2,
                         max_word_types: int = 1_000_000,
                         table: str = "documents",
                         text_col: str = "text") -> str:
    """Promoted to __spark_entry__._bpe_oracle_sql in r10 (the declared
    `bpe_train` query) — this wrapper delegates so the draft validator
    and the declared oracle can never diverge."""
    assert (table, text_col) == ("documents", "text"), \
        "the promoted builder is fixed to the documents table"
    from __spark_entry__ import _bpe_oracle_sql
    return _bpe_oracle_sql(num_merges=num_merges, min_count=min_count,
                           min_pair_count=min_pair_count,
                           max_word_types=max_word_types)


def main() -> None:
    import time

    import duckdb

    from pydata_vector_search_spark.operators.bpe import bpe_train
    from pydata_vector_search_spark.session import get_spark

    dirs = sys.argv[1:] or ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
    spark = get_spark("bpe_draft")
    spark.sparkContext.setLogLevel("ERROR")
    sql = build_bpe_oracle_sql(num_merges=12, min_pair_count=2)
    for d in dirs:
        docs = spark.read.parquet(f"{d}/documents.parquet")
        got = sorted(map(tuple,
                         bpe_train(docs, "text", num_merges=12,
                                   min_pair_count=2).collect()))
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{d}/documents.parquet')")
        t0 = time.perf_counter()
        want = sorted(map(tuple, con.execute(sql).fetchall()))
        dt = time.perf_counter() - t0
        assert got == want, f"{d}: MISMATCH\n got={got}\nwant={want}"
        print(f"{d}: EXACT — {len(got)} merges, duckdb {dt:.1f}s; "
              f"first 3: {got[:3]}")


if __name__ == "__main__":
    main()
