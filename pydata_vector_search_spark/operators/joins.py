"""Temporal joins Spark lacks as built-ins: as-of and range (interval).

Not exercised by the reference (batch-only jobs table; SURVEY §2.4 J2-J6)
— included because a training-data pipeline over event streams needs them
and both compose from Spark primitives without UDFs.

* ``asof_join`` — for every left row, the latest right row with
  ``right.time <= left.time`` per key. The scalable formulation is NOT a
  theta-join (quadratic): tag both sides, union, and run one
  ``last(..., ignorenulls=True)`` window over (key, time) — a single
  shuffle on the key, linear scan per partition, identical to what
  dedicated engines (kdb, QuestDB) do after their time sort. 100 TB note:
  state per group is one row; skewed keys fall to AQE.

* ``range_join`` — left.time ∈ [right.start, right.end). Naive theta-join
  explodes; instead both sides are bucketed to a coarse grain and joined
  on (key, bucket) equality — each right interval replicates to the
  buckets it spans (``sequence``), so the join is an equi-join whose
  fan-out is bounded by interval-length/grain, then an exact filter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str, time_col: str,
              right_time_col: str | None = None,
              value_cols: list[str] | None = None,
              suffix: str = "_r") -> DataFrame:
    """For each left row: columns of the latest right row whose time ≤ the
    left row's time, matched per ``on`` key. Left rows with no prior right
    row get nulls (left-asof semantics, DuckDB ``ASOF LEFT JOIN`` parity).

    Ties: a right row AT the left timestamp matches (≤); among right rows
    with identical (key, time) the highest-ordered one wins
    deterministically.
    """
    rt = right_time_col or time_col
    value_cols = value_cols or [c for c in right.columns
                                if c not in (on, rt)]
    out_vals = [f"{c}{suffix}" for c in value_cols]

    l_tag = (left.withColumn("__t", F.col(time_col))
                 .withColumn("__is_l", F.lit(1)))
    for c, oc in zip(value_cols, out_vals):
        l_tag = l_tag.withColumn(oc, F.lit(None).cast(dict(right.dtypes)[c]))
    r_tag = (right.select(F.col(on), F.col(rt).alias("__t"),
                          *[F.col(c).alias(oc)
                            for c, oc in zip(value_cols, out_vals)])
                  .withColumn("__is_l", F.lit(0)))

    u = l_tag.unionByName(r_tag, allowMissingColumns=True)
    # right rows sort before the left row at equal time → "≤" semantics
    w = (Window.partitionBy(on)
               .orderBy(F.col("__t").asc(), F.col("__is_l").asc())
               .rowsBetween(Window.unboundedPreceding, 0))
    for oc in out_vals:
        u = u.withColumn(oc, F.last(oc, ignorenulls=True).over(w))
    return (u.filter(F.col("__is_l") == 1)
             .drop("__t", "__is_l"))


def range_join(left: DataFrame, right: DataFrame, on: str, time_col: str,
               start_col: str, end_col: str,
               grain_seconds: int = 3600) -> DataFrame:
    """Inner join on key equality AND ``start ≤ time < end``, via coarse
    time-bucket equi-join + exact filter. ``grain_seconds`` trades
    replication (each interval lands in ceil(len/grain)+1 buckets) against
    join selectivity; pick ≈ the typical interval length."""
    g = grain_seconds
    lb = F.floor(F.unix_timestamp(F.col(time_col)) / g).cast("long")
    l = left.withColumn("__b", lb).alias("__l")
    sb = F.floor(F.unix_timestamp(F.col(start_col)) / g).cast("long")
    eb = F.floor(F.unix_timestamp(F.col(end_col)) / g).cast("long")
    r = (right.withColumn("__b", F.explode(F.sequence(sb, eb)))
              .alias("__r"))
    cond = ((F.col(f"__l.{on}") == F.col(f"__r.{on}"))
            & (F.col("__l.__b") == F.col("__r.__b"))
            & (F.col(f"__l.{time_col}") >= F.col(f"__r.{start_col}"))
            & (F.col(f"__l.{time_col}") < F.col(f"__r.{end_col}")))
    return (l.join(r, cond, "inner")
             .drop(F.col("__r.__b")).drop(F.col("__l.__b"))
             .drop(F.col(f"__r.{on}")))
