"""r11 declaration draft: DuckDB oracle for a `collocations_pmi`
query — PMI collocation mining replayed exactly.

The SQL replays operators/collocations.py::collocations_pmi
bit-for-bit (the bm25/lm_score micro-nat discipline): exact long
bigram counts, marginals aggregated over the DISTINCT-PAIR table (not
the corpus), one ln of the fixed-association integer ratio
``(c12 * N) / (cl * cr)`` floored into micro-nats, total output order
(pmi_micro DESC, pair_count DESC, w1, w2). The same SQL already pins
the operator in tests/test_collocations.py (which imports THIS
builder, so the draft and the test can never diverge).

Run as a script to validate against the Spark operator with
oracle_check's rows+multiset compare:
    python tools/collocations_oracle_draft.py [sf_dir ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def build_collocations_oracle_sql(min_count: int = 5,
                                  top_k: int = 30) -> str:
    """Promoted to __spark_entry__._collocations_oracle_sql in r11 (the
    declared `collocations_pmi` query) — delegating wrapper so the
    draft validator, the parity test (tests/test_collocations.py
    imports this builder) and the declared oracle can never diverge."""
    from __spark_entry__ import _collocations_oracle_sql
    return _collocations_oracle_sql(min_count=min_count, top_k=top_k)


def main() -> None:
    import duckdb

    from pydata_vector_search_spark.operators.collocations import \
        collocations_pmi
    from pydata_vector_search_spark.session import get_spark

    dirs = sys.argv[1:] or ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
    spark = get_spark("collocations_draft")
    spark.sparkContext.setLogLevel("ERROR")
    for d in dirs:
        docs = spark.read.parquet(f"{d}/documents.parquet")
        got = [tuple(r) for r in
               collocations_pmi(docs, "text", min_count=5,
                                top_k=30).collect()]
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{d}/documents.parquet')")
        want = [tuple(r) for r in
                con.execute(build_collocations_oracle_sql(5, 30))
                .fetchall()]
        assert got == want, (
            f"{d}: MISMATCH — first diff "
            f"{next((g, w) for g, w in zip(got, want) if g != w)}")
        print(f"{d}: EXACT — top-{len(got)} collocations; "
              f"head: {got[:2]}")


if __name__ == "__main__":
    main()
