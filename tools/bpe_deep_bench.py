"""Driver-side deep-merge benchmark for BPE training (r10).

The sf testdata's synthetic text has ~31 word types, so the corpus
probes cannot exercise the merge loop at realistic vocabulary sizes.
This tool builds a synthetic Zipf word-frequency table (the shape a
web corpus produces) ENTIRELY driver-side and times

* the shipped incremental loop (``operators/bpe._learn_merges``:
  inverted pair index + lazy max-heap, O(affected words) per merge),
* the full-recount reference (the pre-r10 loop shape, also what
  ``tests/test_bpe._naive`` pins correctness against), time-capped
  with a linear projection once it exceeds the cap.

Both produce bit-identical merge tables (asserted on the common
prefix). No Spark involved — this isolates exactly the component the
r09 verdict's watch item was about.

Usage: python tools/bpe_deep_bench.py [n_types] [n_merges]
"""

from __future__ import annotations

import os
import random
import string
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pydata_vector_search_spark.operators.bpe import (  # noqa: E402
    _learn_merges, _merge_word)

_RECOUNT_CAP_S = 120.0


def _zipf_vocab(n_types: int, seed: int = 42) -> list[tuple[str, int]]:
    rng = random.Random(seed)
    out = []
    for r in range(1, n_types + 1):
        w = "".join(rng.choices(string.ascii_lowercase,
                                k=rng.randint(3, 12)))
        out.append((w, max(1, int(10_000_000 / r))))   # Zipf counts
    # dedup words keeping the higher count (collisions are rare)
    best: dict[str, int] = {}
    for w, c in out:
        best[w] = max(best.get(w, 0), c)
    return sorted(best.items(), key=lambda kv: (-kv[1], kv[0]))


def _recount_loop(freq, num_merges, min_pair_count, cap_s):
    t0 = time.time()
    seqs = [(list(w), c) for w, c in freq]
    merges = []
    for step in range(1, num_merges + 1):
        counts: dict = {}
        for syms, c in seqs:
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + c
        if not counts:
            break
        (left, right), best = min(counts.items(),
                                  key=lambda kv: (-kv[1], kv[0]))
        if best < min_pair_count:
            break
        merges.append((step, left, right, best))
        seqs = [(_merge_word(s, left, right) if left in s else s, c)
                for s, c in seqs]
        el = time.time() - t0
        if el > cap_s:
            return merges, el, el / step * num_merges
    return merges, time.time() - t0, None


def main() -> None:
    n_types = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_merges = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000
    freq = _zipf_vocab(n_types)
    print(f"{len(freq)} word types, {sum(len(w) for w, _ in freq)} symbols, "
          f"{n_merges} merges")

    t0 = time.time()
    inc = _learn_merges(freq, n_merges, min_pair_count=1)
    t_inc = time.time() - t0
    print(f"incremental loop: {len(inc)} merges in {t_inc:.1f}s")

    rec, t_rec, proj = _recount_loop(freq, n_merges, 1, _RECOUNT_CAP_S)
    if proj is None:
        print(f"recount loop:     {len(rec)} merges in {t_rec:.1f}s "
              f"({t_rec / max(t_inc, 1e-9):.0f}x slower)")
    else:
        print(f"recount loop:     capped at {len(rec)} merges after "
              f"{t_rec:.0f}s — projected {proj:.0f}s for {n_merges} "
              f"({proj / max(t_inc, 1e-9):.0f}x slower)")
    assert inc[:len(rec)] == rec, "merge tables diverge"
    print("common-prefix merge tables identical")


if __name__ == "__main__":
    main()
