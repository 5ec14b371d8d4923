"""r12 declaration draft (staged r11): DuckDB oracle for a
`curation_chain` query — the full corpus-curation composition a
pretraining run executes BEFORE the dataloader stage, as one lineage:

    1. per-domain token cap  (domain_token_cap, cap_tokens=2000 —
       the CCNet/RefinedWeb per-source downsampling gate)
    2. exact dedup           (min doc_id per normalized-text md5
       fingerprint over the SURVIVORS — real pipeline order)
    3. quality gate          (round(quality_score, 2) >= 0.5 — the
       clean_pipeline discipline)
    4. global token budget   (select_token_budget, budget_tokens=5000
       — "the best 5k tokens of what's left")

Every stage is the identical operator its standalone green oracle
pins (domain_token_cap / dedup_exact / corpus_filter /
token_budget_select); the chained oracle replays all four, so the
value hash also pins the STAGE BOUNDARIES — cap survivors feed the
fingerprint dedup, dedup survivors feed the gate, gate survivors feed
the budget ranking. Together with dataloader_epoch (mix -> budget ->
pack -> shard) this closes the corpus-to-epoch story end to end.

This is the LAST free window slot ever (the 50-slot / 2-round-
staleness saturation arithmetic: r12 has exactly 1 free slot, r13+
zero), chosen per the r10 verdict's guidance: a composition that
closes an end-to-end story rather than a new primitive.

Output is doc-level membership (doc_id, lang, source) — the strongest
hash for a selection pipeline.

Run as a script to validate at sf0.001 and sf0.01:
    python tools/curation_chain_oracle_draft.py [sf_dir ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def build_curation_chain_oracle_sql(cap_tokens: int = 2000,
                                    min_quality: float = 0.5,
                                    budget_tokens: int = 5000) -> str:
    """Promoted to __spark_entry__._curation_chain_oracle_sql in r12
    (the declared `curation_chain` query) — delegating wrapper so the
    draft validator, tests/test_curation.py, and the declared oracle
    can never diverge. The budget stage uses RAW (non-coalesced) token
    counts — the r12 ADVICE-medium fix; only the cap stage coalesces."""
    from __spark_entry__ import _curation_chain_oracle_sql
    return _curation_chain_oracle_sql(cap_tokens=cap_tokens,
                                      min_quality=min_quality,
                                      budget_tokens=budget_tokens)


def curation_chain(docs, cap_tokens: int = 2000, min_quality: float = 0.5,
                   budget_tokens: int = 5000, distributed: bool = True):
    """The Spark lineage under declaration (promotes to
    __spark_entry__.q_curation_chain in r12) — delegates to the
    promoted operator (operators/curation.curate_corpus, r11) with the
    declared projection. ``distributed=True``: the declared config runs
    the cap stage's whale-safe spelling (identical rows — pinned by
    tests/test_domain_cap.py — so the single-window oracle is
    unchanged; the kmeans_sample/domain_token_cap pin-the-scale-path
    precedent)."""
    from pyspark.sql import functions as F

    from pydata_vector_search_spark.operators.curation import curate_corpus

    sel = curate_corpus(docs, "text", "doc_id", "source",
                        cap_tokens=cap_tokens, min_quality=min_quality,
                        budget_tokens=budget_tokens,
                        distributed=distributed)
    return (sel.select(F.col("doc_id").cast("long").alias("doc_id"),
                       "lang", "source")
               .orderBy("doc_id"))



def main() -> None:
    import duckdb

    from pydata_vector_search_spark.session import get_spark

    dirs = sys.argv[1:] or ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
    spark = get_spark("curation_chain_draft")
    spark.sparkContext.setLogLevel("ERROR")
    for d in dirs:
        docs = spark.read.parquet(f"{d}/documents.parquet")
        got = [tuple(r) for r in curation_chain(docs).collect()]
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{d}/documents.parquet')")
        want = [tuple(r) for r in
                con.execute(build_curation_chain_oracle_sql()).fetchall()]
        assert got == want, (
            f"{d}: MISMATCH — {len(got)} spark vs {len(want)} duckdb; "
            f"first diff "
            f"{next(((g, w) for g, w in zip(got, want) if g != w), None)}")
        n_src = len({s for _, _, s in got})
        print(f"{d}: EXACT — {len(got)} curated docs across "
              f"{n_src} sources")


if __name__ == "__main__":
    main()
