"""Skew mitigation: salted two-phase aggregation and salted broadcast-free
join (SURVEY §4 O12; the explicit counterpart of AQE's skew-join split).

At 100 TB a handful of hot keys (one language, one event type, the empty
document) can pin a single reducer while 999 executors idle. AQE splits
skewed JOIN partitions, but aggregation skew and deliberate layout control
need the classic salting rewrites, expressed here as plan-to-plan
transformations (no UDFs, no RDDs):

* ``salted_aggregate`` — groupBy(keys + salt) partial → groupBy(keys)
  final. Works for any algebraic aggregate (count/sum/min/max and their
  compositions); the hot key's rows spread over ``num_salts`` reducers in
  phase 1 and phase 2 touches only #groups × num_salts pre-aggregated rows.
* ``salted_join`` — the skewed (big) side gets a deterministic salt from a
  spread column; the small side is replicated ``num_salts``× via explode;
  the join key becomes (key, salt). Row-identical to the unsalted join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_SALT = "__salt"


def salted_aggregate(df: DataFrame, keys: list[str],
                     aggs: dict[str, tuple[str, str]],
                     num_salts: int = 16,
                     spread_col: str | None = None) -> DataFrame:
    """Two-phase skew-proof aggregation.

    ``aggs`` maps output name -> (fn, input col) with fn in
    {count, sum, min, max, avg}. avg is decomposed into sum+count and
    recombined exactly (never averaged-of-averages). The salt is
    ``xxhash64(spread_col) % num_salts`` (deterministic) or a per-row
    monotonic id when no spread column is given."""
    spread = (F.xxhash64(F.col(spread_col)) if spread_col
              else F.monotonically_increasing_id())
    salted = df.withColumn(_SALT, F.pmod(spread, F.lit(num_salts)))

    partial_exprs, final_exprs = [], []
    for out, (fn, col) in aggs.items():
        if fn == "count":
            partial_exprs.append(F.count(col).alias(f"__p_{out}"))
            final_exprs.append(F.sum(f"__p_{out}").alias(out))
        elif fn == "sum":
            partial_exprs.append(F.sum(col).alias(f"__p_{out}"))
            final_exprs.append(F.sum(f"__p_{out}").alias(out))
        elif fn == "min":
            partial_exprs.append(F.min(col).alias(f"__p_{out}"))
            final_exprs.append(F.min(f"__p_{out}").alias(out))
        elif fn == "max":
            partial_exprs.append(F.max(col).alias(f"__p_{out}"))
            final_exprs.append(F.max(f"__p_{out}").alias(out))
        elif fn == "avg":
            partial_exprs.append(F.sum(col).alias(f"__ps_{out}"))
            partial_exprs.append(F.count(col).alias(f"__pc_{out}"))
            final_exprs.append((F.sum(f"__ps_{out}")
                                / F.sum(f"__pc_{out}")).alias(out))
        else:
            raise ValueError(f"unsupported aggregate {fn!r}")

    partial = salted.groupBy(*keys, _SALT).agg(*partial_exprs)
    return partial.groupBy(*keys).agg(*final_exprs)


def salted_join(big: DataFrame, small: DataFrame, on: str,
                num_salts: int = 16,
                spread_col: str | None = None) -> DataFrame:
    """Inner equi-join resilient to hot keys WITHOUT broadcasting: the big
    side salts deterministically, the small side replicates to every salt
    (explode of a num_salts sequence), and the shuffle key is (key, salt)
    — a hot key now occupies num_salts reducers. Use when the small side
    is too big to broadcast but the big side's keys are skewed."""
    spread = (F.xxhash64(F.col(spread_col)) if spread_col
              else F.monotonically_increasing_id())
    b = big.withColumn(_SALT, F.pmod(spread, F.lit(num_salts)))
    s = small.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1))
                         .cast("array<long>")))
    return b.join(s, [on, _SALT], "inner").drop(_SALT)
