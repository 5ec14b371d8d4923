"""Fresh-session ISOLATED warm measurement for declared queries.

The in-bench ``slowest_rerun_warm`` rerun happens at session end, under
100+ queries of JVM residue (dead broadcasts, stale codegen caches), so
it can read high. This tool answers the question a flagged bench number
actually raises — "is the QUERY slower, or was the session dirty?" — by
measuring in a brand-new process/session with only the standard cheap
warmups applied (table footers, one Arrow round-trip, one codegen
expression). The last run of ``n`` is the steady-state number.

Usage: python tools/isolated_warm.py QUERY [QUERY ...] [--sf=SF_DIR]
(both ``--sf=SF_DIR`` and the two-token ``--sf SF_DIR`` are accepted)
Env: ISOLATED_RUNS (default 2) runs per query; ISOLATED_TIMEOUT
(default 900 s) per-child wall clock — on expiry the child's WHOLE
process group (python + PySpark JVM) is killed so a hung query cannot
leave a JVM holding memory/cores under later measurements.
Prints one JSON line per query: {"query", "runs", "warm"}.
Invoked automatically by bench.py for any query >1.5x its prior-round
time (r05 verdict #2 protocol); also usable by hand.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    args, it = [], iter(sys.argv[1:])
    for a in it:
        if a == "--sf":                     # two-token form: --sf SF_DIR
            sf_dir = next(it, sf_dir)
        elif a.startswith("--sf="):
            sf_dir = a.split("=", 1)[1]
        else:
            args.append(a)
    n_runs = int(os.environ.get("ISOLATED_RUNS", "2"))
    child_timeout = float(os.environ.get("ISOLATED_TIMEOUT", "900"))

    if len(args) > 1:
        # one SUBPROCESS per query: a shared session would leak the
        # earlier queries' residue (dead broadcasts, codegen caches,
        # shuffle files) into the later measurements — measured 2x on
        # winnow_clusters behind jaccard_auto_heavy in one session
        # (14.1 s vs 6.8 s truly isolated). Sequential, with a short
        # settle so the prior JVM's teardown cannot overlap the next
        # session's startup.
        import signal
        import subprocess
        for name in args:
            # start_new_session: the child owns a process group, so a
            # timeout kill reaches the PySpark JVM GRANDCHILD too — a
            # surviving JVM from a hung query would hold memory/cores
            # and contaminate every subsequent isolated measurement,
            # the exact residue this tool exists to exclude.
            proc = subprocess.Popen(
                [sys.executable, os.path.abspath(__file__), name,
                 f"--sf={sf_dir}"],
                stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                text=True, start_new_session=True)
            try:
                stdout, stderr = proc.communicate(timeout=child_timeout)
                out = subprocess.CompletedProcess(
                    proc.args, proc.returncode, stdout, stderr)
            except subprocess.TimeoutExpired:
                # one hung query must not kill the rest of the sweep —
                # kill the whole group (python child + JVM grandchild)
                try:
                    os.killpg(proc.pid, signal.SIGKILL)
                except (ProcessLookupError, PermissionError):
                    pass
                proc.communicate()
                print(json.dumps({"query": name,
                                  "error": f"timeout {child_timeout:g}s"}),
                      flush=True)
                time.sleep(8)
                continue
            emitted = False
            for line in out.stdout.splitlines():
                if line.startswith("{"):
                    print(line, flush=True)
                    emitted = True
            if out.returncode != 0 or not emitted:
                # surface the crash instead of silently emitting nothing
                print(json.dumps({"query": name, "error":
                                  f"rc={out.returncode}: "
                                  + out.stderr.strip()[-400:]}),
                      flush=True)
            time.sleep(8)
        return

    import __spark_entry__ as entry
    from pydata_vector_search_spark.catalog import read_table
    from pydata_vector_search_spark.session import get_spark

    spark = get_spark("isolated_warm")
    spark.sparkContext.setLogLevel("ERROR")
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        try:
            read_table(spark, sf_dir, t).count()
        except Exception:
            pass
    from pyspark.sql import functions as F
    spark.range(64).repartition(8).mapInPandas(
        lambda it: it, "id long").count()
    spark.range(1000).select(F.md5(F.col("id").cast("string"))).count()

    qs = entry.queries()
    for name in args:
        fn = qs.get(name)
        if fn is None:
            # clean error line instead of a bare KeyError traceback —
            # the multi-query parent surfaces it verbatim
            print(json.dumps({"query": name,
                              "error": "unknown query (not declared)"}))
            continue
        runs = []
        for _ in range(n_runs):
            t0 = time.perf_counter()
            len(fn(spark, sf_dir).collect())
            runs.append(round(time.perf_counter() - t0, 3))
        print(json.dumps({"query": name, "sf_dir": sf_dir,
                          "runs": runs, "warm": runs[-1]}))


if __name__ == "__main__":
    main()
