"""Regenerate PLANS.md: formatted physical plans of the flagship queries
with the scale-argument commentary. Usage: python tools/dump_plans.py
[sf_dir]."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NOTES = {
    "hybrid_prefilter": (
        "Pre-filter hybrid search — the headline improvement over the "
        "reference's post-filter (demo.ipynb c13:1-4). The label predicate "
        "is INSIDE the scan (PushedFilters), the cosine distance is a "
        "codegen'd expression above it, and the top-k is "
        "TakeOrderedAndProject: no shuffle, no global sort. At 100 TB each "
        "task keeps a k-row heap; the driver merges k rows per task."),
    "ann_ivf_knn": (
        "IVF probe: the scan carries PartitionFilters on __cid — "
        "directories outside the probed centroid set are never listed or "
        "opened. Above it, the same exact re-rank plan as hybrid_prefilter."),
    "join_multiway": (
        "Star join: every dimension is a BroadcastHashJoin build side; the "
        "lineitem fact table is never shuffled until the final single-key "
        "aggregate."),
    "agg_pricing_summary": (
        "TPC-H Q1 shape: partial HashAggregate before the exchange "
        "(map-side combine), one hash exchange on the 2-column group key, "
        "final HashAggregate."),
    "minhash_neardup": (
        "MinHash-LSH: shingle hash-aggregate collapses to docs x "
        "num_hashes before any shuffle; the banded self-join reuses one "
        "exchange (ReusedExchange); exact Jaccard verification touches "
        "only co-bucketed candidate pairs."),
    "shipping_priority": (
        "TPC-H Q3 shape: both filtered dimensions broadcast "
        "(BroadcastHashJoin); lineitem — the fact — is scanned once with "
        "its date filter pushed down and shuffles exactly once, on the "
        "aggregate key. TakeOrderedAndProject caps the result at k."),
    "scalar_subquery": (
        "TPC-H Q17 shape, written DECORRELATED: the per-part avg is one "
        "hash aggregate over lineitem, joined back instead of a per-row "
        "correlated re-scan; the brand dimension is broadcast. This is "
        "the only shape that survives 100 TB — correlated execution would "
        "rescan the fact once per outer row."),
}


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    import __spark_entry__ as entry
    from pydata_vector_search_spark.session import get_spark

    spark = get_spark("dump_plans")
    spark.sparkContext.setLogLevel("ERROR")

    out = ["# PLANS — physical-plan evidence for the flagship queries", "",
           f"Generated from `.explain('formatted')` at {os.path.basename(sf)}"
           " on local[32]. These are",
           "the plans the scale arguments in README.md claim; re-generate with",
           "`python tools/dump_plans.py`.", ""]
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted")
    for name, note in NOTES.items():
        df = entry.queries()[name](spark, sf)
        plan = df._jdf.queryExecution().explainString(mode)
        head = plan.split("\n\n")[0]
        out += [f"## {name}", "", note, "", "```", head.strip(), "```", ""]
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print("wrote PLANS.md")


if __name__ == "__main__":
    main()
