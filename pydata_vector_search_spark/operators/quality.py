"""Declarative data-quality validation — the constraint gate a pipeline
runs before publishing a table.

A rule set compiles to ONE aggregate pass over the table (every check is
a conditional count in the same Aggregate — no per-rule scans), plus one
grouped pass per uniqueness rule and one anti-join per referential rule.
Everything is plain Catalyst: predicates push down, the scan is shared,
and the report is a tiny DataFrame — the shape dbt tests / Deequ checks
compile to, re-expressed with no framework.

Rule kinds:

* ``not_null(col)``            — NULLs are violations
* ``unique(col)``              — rows sharing a duplicated value (all
                                 members of a duplicate group count)
* ``in_range(col, lo, hi)``    — value outside [lo, hi] (NULL passes;
                                 pair with not_null to forbid)
* ``matches(col, regex)``      — non-matching non-NULL values
* ``check(name, predicate)``   — arbitrary boolean SQL/Column; rows
                                 where it is FALSE or NULL violate
* ``references(col, dim, dim_col)`` — foreign-key: non-NULL values
                                 absent from the dimension column

Scale: the single-pass aggregate is map-side combinable; uniqueness
shuffles once on the checked column (the same cost any duplicate count
pays); referential checks are left-anti joins — broadcast when the
dimension is small, shuffle otherwise (AQE decides).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

from pyspark.sql import Column, DataFrame, functions as F


@dataclass(frozen=True)
class Rule:
    kind: str
    name: str
    payload: tuple


def not_null(col: str) -> Rule:
    return Rule("not_null", f"not_null:{col}", (col,))


def unique(col: str) -> Rule:
    return Rule("unique", f"unique:{col}", (col,))


def in_range(col: str, lo: Any, hi: Any) -> Rule:
    return Rule("in_range", f"in_range:{col}", (col, lo, hi))


def matches(col: str, regex: str) -> Rule:
    return Rule("matches", f"matches:{col}", (col, regex))


def check(name: str, predicate: Column | str) -> Rule:
    return Rule("check", f"check:{name}", (predicate,))


def references(col: str, dim: DataFrame, dim_col: str) -> Rule:
    return Rule("references", f"references:{col}", (col, dim, dim_col))


def validate(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Run the rule set; returns (rule, violations, total) — one row per
    rule, ordered by rule name. ``violations`` counts VIOLATING ROWS (a
    passing table reads all-zero), ``total`` is the table row count so a
    consumer can turn counts into rates without a second scan."""
    simple_exprs = []
    for r in rules:
        if r.kind == "not_null":
            cond = F.col(r.payload[0]).isNull()
        elif r.kind == "in_range":
            c, lo, hi = r.payload
            cond = F.col(c).isNotNull() & (
                (F.col(c) < F.lit(lo)) | (F.col(c) > F.lit(hi)))
        elif r.kind == "matches":
            c, rx = r.payload
            cond = F.col(c).isNotNull() & ~F.col(c).rlike(rx)
        elif r.kind == "check":
            p = r.payload[0]
            p = F.expr(p) if isinstance(p, str) else p
            cond = ~F.coalesce(p, F.lit(False))
        else:
            continue
        simple_exprs.append(F.sum(cond.cast("long")).alias(r.name))

    agg = df.agg(F.count(F.lit(1)).alias("__total"), *simple_exprs)
    total = F.col("__total")
    rows = []
    simple_names = [r.name for r in rules
                    if r.kind in ("not_null", "in_range", "matches", "check")]
    if simple_names:
        # stack() pivots the one aggregate row to (rule, violations) rows —
        # one guaranteed scan for every simple rule, no union-branch
        # re-aggregation
        pairs = ", ".join(f"'{n}', `{n}`" for n in simple_names)
        rows.append(agg.selectExpr(
            f"stack({len(simple_names)}, {pairs}) AS (rule, violations)",
            "__total AS total"))

    for r in rules:
        if r.kind == "unique":
            c = r.payload[0]
            dup = (df.groupBy(c).agg(F.count(F.lit(1)).alias("__n"))
                     .filter(F.col("__n") > 1)
                     .agg(F.coalesce(F.sum("__n"), F.lit(0)).cast("long")
                           .alias("violations")))
            rows.append(dup.crossJoin(agg.select(total.alias("total")))
                           .select(F.lit(r.name).alias("rule"),
                                   "violations", "total"))
        elif r.kind == "references":
            c, dim, dim_col = r.payload
            orphan = (df.filter(F.col(c).isNotNull())
                        .join(dim.select(F.col(dim_col).alias(c)).distinct(),
                              c, "left_anti")
                        .agg(F.count(F.lit(1)).cast("long")
                              .alias("violations")))
            rows.append(orphan.crossJoin(agg.select(total.alias("total")))
                              .select(F.lit(r.name).alias("rule"),
                                      "violations", "total"))

    from functools import reduce
    out = reduce(lambda a, b: a.unionByName(b), rows)
    return out.orderBy("rule")


def profile(df: DataFrame, columns: list[str] | None = None,
            exact_distinct: bool = True) -> DataFrame:
    """One-pass table profile: (column, n_rows, n_null, n_distinct,
    min_value, max_value) per column, min/max computed on the native type
    then rendered as strings (casting first would compare "10" < "9").

    ``exact_distinct=True`` uses COUNT(DISTINCT) — Catalyst compiles the
    multi-column form through an Expand node (input rows × columns), fine
    for dozens of columns; at corpus scale pass False for
    approx_count_distinct (HLL++, single pass, no Expand — estimates, so
    the declared oracle uses the exact form)."""
    cols = columns or df.columns
    nd = (F.countDistinct if exact_distinct
          else lambda c: F.approx_count_distinct(c))
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"__null_{c}"),
            nd(c).cast("long").alias(f"__nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__max_{c}"),
        ]
    agg = df.agg(*aggs)
    quads = ", ".join(
        f"'{c}', `__null_{c}`, `__nd_{c}`, `__min_{c}`, `__max_{c}`"
        for c in cols)
    return (agg.selectExpr(
                f"stack({len(cols)}, {quads}) AS "
                "(column, n_null, n_distinct, min_value, max_value)",
                "__n AS n_rows")
               .select("column", "n_rows", "n_null", "n_distinct",
                       "min_value", "max_value")
               .orderBy("column"))
