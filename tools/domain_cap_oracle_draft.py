"""r11 declaration draft: DuckDB oracle for a `domain_token_cap`
query — the per-domain quality-ordered token cap replayed as the naive
per-domain running-sum window.

The Spark side under declaration is the DISTRIBUTED branch
(``distributed=True`` — bucket-routed, driver-free, whale-safe; see
operators/text_ops.domain_token_cap), the same pin-the-scale-path
choice kmeans_sample made for the salted tournament. The oracle is the
single-window spelling the distributed branch provably equals:
quality_score replayed in full SQL (the text_stats expression, here at
round 6), token counts coalesced to 0, (quality DESC NULLS LAST, id)
order, inclusive running total <= cap.

Run as a script to validate at sf0.001 and sf0.01:
    python tools/domain_cap_oracle_draft.py [sf_dir ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def build_domain_cap_oracle_sql(cap_tokens: int = 600) -> str:
    """Promoted to __spark_entry__._domain_cap_oracle_sql in r11 (the
    declared `domain_token_cap` query) — delegating wrapper so the
    draft validator and the declared oracle can never diverge."""
    from __spark_entry__ import _domain_cap_oracle_sql
    return _domain_cap_oracle_sql(cap_tokens=cap_tokens)


def main() -> None:
    import duckdb

    from pydata_vector_search_spark.operators.text_ops import \
        domain_token_cap
    from pydata_vector_search_spark.session import get_spark

    dirs = sys.argv[1:] or ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
    spark = get_spark("domain_cap_draft")
    spark.sparkContext.setLogLevel("ERROR")
    for d in dirs:
        docs = spark.read.parquet(f"{d}/documents.parquet")
        kept = domain_token_cap(docs, "text", "doc_id", "source",
                                cap_tokens=600, distributed=True)
        got = sorted((r.doc_id, r.source) for r in
                     kept.select("doc_id", "source").collect())
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{d}/documents.parquet')")
        want = sorted(map(tuple, con.execute(
            build_domain_cap_oracle_sql(600)).fetchall()))
        assert got == want, (
            f"{d}: MISMATCH — {len(got)} spark vs {len(want)} duckdb; "
            f"first diff "
            f"{next((g, w) for g, w in zip(got, want) if g != w)}")
        n_dom = len({s for _, s in got})
        print(f"{d}: EXACT — {len(got)} kept docs across "
              f"{n_dom} domains")


if __name__ == "__main__":
    main()
