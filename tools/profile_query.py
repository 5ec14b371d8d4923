"""Per-query profile: construction vs action split, Spark job count, and
optionally the formatted plan — the r16 optimization round's measurement
instrument (guide §1: measure first; §1.4: noop sink).

For each named query, in one warm session:
  - t_construct: wall time of ``fn(spark, sf_dir)`` — covers plan
    construction (Py4J) plus any EAGER work the query runs at build time
    (catalog writes, index builds, streaming micro-batches, checkpoints).
  - t_noop: wall time of a noop-sink write of the returned DataFrame
    (computes every column of every row, discards the result — guide
    §1.4; avoids confounding with driver collect/row conversion).
  - t_collect: wall time of the bench's own action (collect), for
    comparability with BENCH_SUMMARY numbers.
  - jobs_construct / jobs_action: Spark job counts per phase (via
    statusTracker job-group deltas) — each job is a scheduling round
    trip; eager materializations show up here.

Usage: python tools/profile_query.py QUERY [QUERY ...] [--sf=SF_DIR]
       [--plan=OUT_DIR]  (writes OUT_DIR/<query>.txt formatted plans)
       [--repeat=N]      (measure phases N times in-session; default 1 —
                          repeats re-run construction too, so eager work
                          is re-measured warm)
Prints one JSON line per query run.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names: list[str] = []
    plan_dir = None
    repeat = 1
    for a in sys.argv[1:]:
        if a.startswith("--sf="):
            sf_dir = a.split("=", 1)[1]
        elif a.startswith("--plan="):
            plan_dir = a.split("=", 1)[1]
        elif a.startswith("--repeat="):
            repeat = int(a.split("=", 1)[1])
        else:
            names.append(a)

    import __spark_entry__ as entry
    from pydata_vector_search_spark.catalog import read_table
    from pydata_vector_search_spark.session import get_spark

    spark = get_spark("profile_query")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    # standard cheap warmups (the isolated_warm set)
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        try:
            read_table(spark, sf_dir, t).count()
        except Exception:
            pass
    from pyspark.sql import functions as F
    spark.range(64).repartition(8).mapInPandas(lambda it: it,
                                               "id long").count()
    spark.range(1000).select(F.md5(F.col("id").cast("string"))).count()

    tracker = sc.statusTracker()

    def njobs() -> int:
        ids = tracker.getJobIdsForGroup(None)
        return max(ids) + 1 if ids else 0

    qs = entry.queries()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted")
    for name in names:
        fn = qs.get(name)
        if fn is None:
            print(json.dumps({"query": name, "error": "unknown query"}))
            continue
        for r in range(repeat):
            j0 = njobs()
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            j1 = njobs()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            j2 = njobs()
            n = len(df.collect())
            t3 = time.perf_counter()
            j3 = njobs()
            print(json.dumps({
                "query": name, "run": r, "rows": n,
                "t_construct": round(t1 - t0, 3),
                "t_noop": round(t2 - t1, 3),
                "t_collect": round(t3 - t2, 3),
                "jobs_construct": j1 - j0,
                "jobs_noop": j2 - j1,
                "jobs_collect": j3 - j2,
            }), flush=True)
        if plan_dir:
            os.makedirs(plan_dir, exist_ok=True)
            plan = df._jdf.queryExecution().explainString(mode)
            with open(os.path.join(plan_dir, f"{name}.txt"), "w") as f:
                f.write(plan)


if __name__ == "__main__":
    main()
