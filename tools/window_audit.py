"""Audit driver-window verification staleness.

For every declared query, report the latest round with a driver-green
CORRECTNESS row, whether it sits inside the current first-50 window,
and flag anything whose latest green is more than MAX_AGE rounds old —
the rotation invariant VERDICT r05 #3 mandates. Run before finalizing
a round's window ordering.

Usage: python tools/window_audit.py [current_round]
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MAX_AGE = 2
WINDOW = 50


def main() -> None:
    import __spark_entry__ as entry

    declared = list(entry.queries().keys())
    cur = (int(sys.argv[1]) if len(sys.argv) > 1 else
           max((int(re.search(r"r(\d+)", p).group(1))
                for p in glob.glob("CORRECTNESS_r*.json")), default=0) + 1)

    latest: dict[str, int] = {}
    for path in sorted(glob.glob("CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)", path).group(1))
        with open(path) as fh:
            data = json.load(fh)
        for q, row in data.items():
            ok = row.get("hash_match") or (row.get("rows_match")
                                           and row.get("schema_match"))
            if ok:
                latest[q] = max(latest.get(q, 0), rnd)

    in_window = set(declared[:WINDOW])
    stale, never = [], []
    for q in declared:
        if q not in latest:
            never.append(q)
        elif cur - latest[q] > MAX_AGE and q not in in_window:
            stale.append((q, latest[q]))

    print(f"declared={len(declared)} window={WINDOW} "
          f"current_round=r{cur:02d} max_age={MAX_AGE}")
    print(f"never driver-green (must be in-window if new): "
          f"{[q for q in never if q in in_window]} in-window, "
          f"{[q for q in never if q not in in_window]} OUTSIDE")
    if stale:
        print(f"STALE outside window (latest green > {MAX_AGE} rounds old):")
        for q, r in sorted(stale, key=lambda t: t[1]):
            print(f"  {q}: last green r{r:02d}")
    else:
        print("no stale queries outside the window — rotation invariant "
              "holds (assuming the in-window set goes green this round)")
    dist: dict[int, int] = {}
    for q in declared:
        dist[latest.get(q, 0)] = dist.get(latest.get(q, 0), 0) + 1
    print("latest-green distribution (0 = never):",
          dict(sorted(dist.items())))


if __name__ == "__main__":
    main()
