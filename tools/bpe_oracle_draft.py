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

from pydata_vector_search_spark.functions.text import BPE_ISH_PATTERN  # noqa: E402


def build_bpe_oracle_sql(num_merges: int = 12, min_count: int = 1,
                         min_pair_count: int = 2,
                         max_word_types: int = 1_000_000,
                         table: str = "documents",
                         text_col: str = "text") -> str:
    pat = BPE_ISH_PATTERN.replace("'", "''")
    parts = [f"""WITH RECURSIVE
seq0 AS MATERIALIZED (
  SELECT word, cnt, string_split(word, '') AS syms FROM (
    SELECT word, COUNT(*)::BIGINT AS cnt FROM (
      SELECT unnest(regexp_extract_all(lower({text_col}), '{pat}')) AS word
      FROM {table}
    ) WHERE length(word) > 0
    GROUP BY word HAVING COUNT(*) >= {min_count}
    ORDER BY cnt DESC, word LIMIT {max_word_types}
  )
)"""]
    for k in range(1, num_merges + 1):
        p = k - 1
        parts.append(f"""p{k} AS MATERIALIZED (
  SELECT syms[t.i] AS l, syms[t.i+1] AS r, SUM(cnt)::BIGINT AS c
  FROM seq{p}, unnest(generate_series(1, len(syms) - 1)) t(i)
  GROUP BY 1, 2
),
b{k} AS MATERIALIZED (SELECT l, r, c FROM p{k}
         WHERE c >= {min_pair_count}
         ORDER BY c DESC, l, r LIMIT 1),
a{k}(word, i, out) AS (
  SELECT word, 1, []::VARCHAR[] FROM seq{p}
  UNION ALL
  SELECT a.word,
    CASE WHEN a.i < len(s.syms) AND s.syms[a.i] = b.l
              AND s.syms[a.i+1] = b.r THEN a.i + 2 ELSE a.i + 1 END,
    CASE WHEN a.i < len(s.syms) AND s.syms[a.i] = b.l
              AND s.syms[a.i+1] = b.r THEN list_append(a.out, b.l || b.r)
         ELSE list_append(a.out, s.syms[a.i]) END
  FROM a{k} a JOIN seq{p} s USING (word) CROSS JOIN b{k} b
  WHERE a.i <= len(s.syms)
),
seq{k} AS MATERIALIZED (
  SELECT a.word, s.cnt, a.out AS syms
  FROM a{k} a JOIN seq{p} s USING (word)
  WHERE a.i = len(s.syms) + 1
)""")
        # steps after an early stop see empty seq{k} -> empty b -> no row
    unions = "\n  UNION ALL ".join(
        f"SELECT {k}::BIGINT AS step, l AS \"left\", r AS \"right\", "
        f"c AS pair_count FROM b{k}" for k in range(1, num_merges + 1))
    parts.append(f"""merges AS (
  {unions}
)""")
    return ",\n".join(parts) + "\nSELECT * FROM merges ORDER BY step"


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
