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


def _c(name: str) -> Column:
    """Column reference that survives ANY column name: backtick-quote the
    identifier, doubling inner backticks (Spark's escaping rule). Plain
    ``F.col``/``df[...]`` parse the name and choke on quotes/backticks."""
    return F.col("`" + name.replace("`", "``") + "`")


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
    passing table reads all-zero — including on an EMPTY table, where
    every conditional SUM is NULL and coalesced to 0), ``total`` is the
    table row count so a consumer can turn counts into rates without a
    second scan.

    Rule/column names never round-trip through SQL text: aggregates use
    positional internal aliases and the display name is attached as a
    literal, so a name containing quotes or backticks cannot break
    parsing."""
    if not rules:
        raise ValueError("validate() needs at least one rule; an empty "
                         "rule set has no defined report")
    simple = [r for r in rules
              if r.kind in ("not_null", "in_range", "matches", "check")]
    simple_exprs = []
    for i, r in enumerate(simple):
        if r.kind == "not_null":
            cond = _c(r.payload[0]).isNull()
        elif r.kind == "in_range":
            c, lo, hi = r.payload
            cond = _c(c).isNotNull() & (
                (_c(c) < F.lit(lo)) | (_c(c) > F.lit(hi)))
        elif r.kind == "matches":
            c, rx = r.payload
            cond = _c(c).isNotNull() & ~_c(c).rlike(rx)
        else:
            p = r.payload[0]
            p = F.expr(p) if isinstance(p, str) else p
            cond = ~F.coalesce(p, F.lit(False))
        simple_exprs.append(F.sum(cond.cast("long")).alias(f"__r{i}"))

    agg = df.agg(F.count(F.lit(1)).alias("__total"), *simple_exprs)
    total = F.col("__total")
    rows = []
    if simple:
        # explode an array of (rule, violations) structs — pivots the one
        # aggregate row to rule rows (one guaranteed scan for every simple
        # rule, no union-branch re-aggregation), with the rule name as a
        # pure literal (no stack()-string interpolation)
        structs = [F.struct(
                       F.lit(r.name).alias("rule"),
                       F.coalesce(F.col(f"__r{i}"), F.lit(0))
                        .cast("long").alias("violations"))
                   for i, r in enumerate(simple)]
        rows.append(agg.select(F.explode(F.array(*structs)).alias("__kv"),
                               total.alias("total"))
                       .select(F.col("__kv.rule").alias("rule"),
                               F.col("__kv.violations").alias("violations"),
                               "total"))

    for r in rules:
        if r.kind == "unique":
            c = r.payload[0]
            dup = (df.groupBy(_c(c)).agg(F.count(F.lit(1)).alias("__n"))
                     .filter(F.col("__n") > 1)
                     .agg(F.coalesce(F.sum("__n"), F.lit(0)).cast("long")
                           .alias("violations")))
            rows.append(dup.crossJoin(agg.select(total.alias("total")))
                           .select(F.lit(r.name).alias("rule"),
                                   "violations", "total"))
        elif r.kind == "references":
            c, dim, dim_col = r.payload
            orphan = (df.filter(_c(c).isNotNull())
                        .join(dim.select(_c(dim_col).alias(c)).distinct(),
                              [c], "left_anti")
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
    the declared oracle uses the exact form).

    Consistency note (r17, ADVICE): the two aggregates below scan ``df``
    as two separate subtrees of one query — on a DETERMINISTIC lineage
    (any parquet/catalog snapshot scan, the declared-query case) both see
    identical rows. A nondeterministic lineage (rand()/sample) or a table
    mutated between the subtree executions could make n_rows/n_distinct
    disagree with n_null/min/max; checkpoint such an input first."""
    cols = columns or df.columns
    if not cols:
        # zero-column frame: the min/max aggregate would be an EMPTY agg
        # (raises); the profile of no columns is an empty result, typed
        return df.sparkSession.createDataFrame(
            [], "column string, n_rows long, n_null long, "
                "n_distinct long, min_value string, max_value string")
    nd = (F.countDistinct if exact_distinct
          else lambda c: F.approx_count_distinct(c))
    # Two aggregates instead of one (r16 optimization, guide §2.3/§7.2).
    # A min/max over a STRING column has an immutable aggregation buffer,
    # which disqualifies HashAggregate — and in the combined spelling that
    # demoted the ENTIRE multi-distinct Expand chain to SortAggregate:
    # input rows × (columns + 1) Expand output went through TWO full
    # sorts on a 6-key wide row (measured 2.5-3.0 s warm on 150k rows at
    # sf0.1; plan: Sort→SortAggregate→Exchange→Sort→SortAggregate²).
    # Splitting min/max/null into their own GROUPING-FREE aggregate (no
    # sort is ever inserted for an empty grouping) lets the distinct
    # counts — whose buffers are all longs — run the Expand chain as
    # partial+final HashAggregate (measured 0.7-0.9 s warm, same rows).
    # Both single-row aggregates join back with a literal cross join; the
    # values are bit-identical, only the physical aggregation changes.
    nd_aggs = [F.count(F.lit(1)).alias("__n")]
    mm_aggs = []
    for i, c in enumerate(cols):
        nd_aggs.append(nd(_c(c)).cast("long").alias(f"__nd_{i}"))
        mm_aggs += [
            F.sum(_c(c).isNull().cast("long")).alias(f"__null_{i}"),
            F.min(_c(c)).cast("string").alias(f"__min_{i}"),
            F.max(_c(c)).cast("string").alias(f"__max_{i}"),
        ]
    agg = df.agg(*nd_aggs).crossJoin(df.agg(*mm_aggs))
    # explode of (column, stats…) structs — column names are attached as
    # literals, never interpolated into SQL text (a name containing a
    # quote or backtick profiles fine); aggregate aliases are positional
    structs = [F.struct(F.lit(c).alias("column"),
                        F.coalesce(F.col(f"__null_{i}"), F.lit(0))
                         .cast("long").alias("n_null"),
                        F.col(f"__nd_{i}").alias("n_distinct"),
                        F.col(f"__min_{i}").alias("min_value"),
                        F.col(f"__max_{i}").alias("max_value"))
               for i, c in enumerate(cols)]
    return (agg.select(F.explode(F.array(*structs)).alias("__kv"),
                       F.col("__n").alias("n_rows"))
               .select("__kv.column", "n_rows", "__kv.n_null",
                       "__kv.n_distinct", "__kv.min_value",
                       "__kv.max_value")
               .orderBy("column"))
