"""Local replica of the driver's t2 correctness harness.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB over the same sf parquet tables, then
compares row count, column names/order-insensitive value multiset.

Usage: python tools/oracle_check.py [sf_dir] [query ...]
                                    [--out=FILE] [--skip=q1,q2,...]

``--out`` redirects the full-run artifact (default ORACLE_LOCAL.json —
use e.g. ORACLE_SF01.json for an sf0.1 sweep so the canonical sf0.01
artifact is not clobbered). ``--skip`` excludes named queries from a
full run while still writing the artifact, with the skip list recorded
in it (the documented carve-out path for the hours-long recursive-CTE
CC oracles at sf0.1).
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def _norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # exact repr — both engines must agree bit-for-bit after in-query rounding
        return repr(v)
    return repr(v)


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(_norm_cell(r[i]) for i in order))
    return sorted(out)


def main():
    out_name, skip = "ORACLE_LOCAL.json", set()
    pos = []
    for a in sys.argv[1:]:
        if a.startswith("--out="):
            out_name = a.split("=", 1)[1]
        elif a.startswith("--skip="):
            skip = {s for s in a.split("=", 1)[1].split(",") if s}
        else:
            pos.append(a)
    sf_dir = pos[0] if pos else "/root/testdata/sf0.01"
    only = set(pos[1:])
    # The first positional is ALWAYS the data dir. Running
    # ``oracle_check.py some_query ...`` (forgetting the sf_dir) would
    # otherwise treat the query name as a path and fail every query
    # with PATH_NOT_FOUND after paying JVM startup — fail fast with a
    # usage error instead (same honesty class as the unknown-name
    # validation below). The check is unconditional (r15 ADVICE): a
    # missing DEFAULT dir must also fail here, not after JVM startup.
    # Diagnostics go to stderr so --out/stdout consumers never ingest
    # error text (r15 ADVICE).
    if not os.path.isdir(sf_dir):
        what = ("first positional" if pos else
                "default sf data dir")
        print(f"ERROR: {what} {sf_dir!r} is not a directory — "
              f"it must be the sf data dir.\n"
              f"usage: oracle_check.py [sf_dir] [query ...] "
              f"[--out=FILE] [--skip=q1,q2,...]", file=sys.stderr)
        sys.exit(2)

    import duckdb
    import __spark_entry__ as entry
    from pydata_vector_search_spark.session import get_spark

    # Validate names BEFORE paying JVM startup: a typo'd positional name
    # would otherwise be silently excluded from n_run and the tool would
    # print "0/0 pass" and exit 0 — a misspelled filtered verification
    # run must read as an ERROR, not as green. Same stderr convention
    # as the sf_dir guard above.
    declared = set(entry.queries())
    unknown = sorted((only | skip) - declared)
    if unknown:
        print(f"ERROR: not in queries(): {unknown}", file=sys.stderr)
        sys.exit(2)

    spark = get_spark("oracle_check")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs, oracles = entry.queries(), entry.oracle_sql()
    failures = []
    results = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name in skip:
            print(f"SKIP {name} (--skip)")
            results[name] = {"status": "skipped"}
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            results[name] = {"status": "spark_error", "error": str(e)[:200]}
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"ok?  {name}: rows={len(srows)} (no oracle — rows-only check)")
            results[name] = {"status": "rows_only", "rows": len(srows)}
            continue
        try:
            rel = con.sql(sql)
            ocols = [c for c in rel.columns]
            orows = rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failures.append(name)
            results[name] = {"status": "duckdb_error", "error": str(e)[:200]}
            continue
        dt = time.time() - t0
        if sorted(scols) != sorted(ocols):
            print(f"FAIL {name}: columns spark={scols} duck={ocols}")
            failures.append(name)
            results[name] = {"status": "columns_mismatch"}
            continue
        if len(srows) != len(orows):
            print(f"FAIL {name}: rowcount spark={len(srows)} duck={len(orows)}")
            failures.append(name)
            results[name] = {"status": "rowcount_mismatch",
                             "spark": len(srows), "duck": len(orows)}
            continue
        sn, on = _norm_rows(scols, srows), _norm_rows(ocols, orows)
        if sn != on:
            bad = [(a, b) for a, b in zip(sn, on) if a != b][:3]
            print(f"FAIL {name}: value mismatch ({sum(1 for a, b in zip(sn, on) if a != b)}/{len(sn)} rows); first diffs:")
            for a, b in bad:
                print(f"   spark: {a}\n   duck : {b}")
            failures.append(name)
            results[name] = {"status": "value_mismatch"}
            continue
        print(f"PASS {name}: {len(srows)} rows [{dt:.1f}s]")
        results[name] = {"status": "pass", "rows": len(srows),
                         "sec": round(dt, 1)}

    n_run = len([q for q in qs if (not only or q in only)
                 and q not in skip])
    print(f"\n{n_run - len(failures)}/{n_run} pass"
          + (f" (of {len(qs)} declared; filtered run)"
             if only or skip else ""))

    # Persist a full run (no query filter) as a repo artifact: the driver's
    # per-round gate covers only the first 50 queries() entries, so this
    # file is the auditable evidence that the WHOLE declared surface was
    # value-hash-verified against the current working tree.
    if not only:
        import json
        import subprocess
        try:
            sha = subprocess.run(["git", "rev-parse", "HEAD"],
                                 capture_output=True, text=True,
                                 cwd=os.path.dirname(os.path.dirname(
                                     os.path.abspath(__file__)))
                                 ).stdout.strip()
        except Exception:
            sha = "unknown"
        here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        with open(os.path.join(here, out_name), "w") as f:
            json.dump({"sf_dir": sf_dir, "git_head": sha,
                       "n_queries": len(qs),
                       "n_pass": len(qs) - len(failures) - len(skip),
                       "skipped": sorted(skip),
                       "failures": failures,
                       "queries": results}, f, indent=2, sort_keys=True)

    if failures:
        print("failures:", failures)
        sys.exit(1)


if __name__ == "__main__":
    main()
