"""DataFrame-level text analysis hot paths.

``functions/text.py`` holds the per-row Column expressions (API surface,
composable anywhere). The marker-counting ones run their lambdas
interpreted (outside whole-stage codegen) — fine per row, wrong as the
corpus-wide hot path. This module re-expresses them as explode →
broadcast-join → conditional-sum pipelines with map-side partial
aggregation: identical results (tests pin equality against the Column
versions row for row), fully codegen'd, shuffle bounded at docs × counts.

Measured honesty note (sf0.1, 5k docs × ~100 tokens): the Column version
WINS here (1.2 s vs 1.6 s warm) — 0.5M interpreted lambda evals are
cheaper than exploding 500k token rows through a join+aggregate. The
table formulation pays off when per-row interpreted work dominates the
exchange: long documents, many marker sets, or reuse of the exploded
tokens across several analyses. Both stay available; pick by profile.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from pydata_vector_search_spark.functions.text import _LANG_MARKERS, normalized_text


def lang_id_table(df: DataFrame, text_col: str, id_col: str,
                  out_col: str = "pred_lang") -> DataFrame:
    """(id, pred_lang) for every row — same semantics as
    ``functions.text.lang_id`` (charset short-circuit, marker-count argmax
    with fixed priority, 'und' when no marker hits).

    Plan: base scan computes the two charset regex flags (scalar,
    codegen'd); distinct tokens explode once and inner-join the ~12-row
    broadcast marker table, so the aggregate only ever sees marker
    occurrences (corpus-size-independent per doc); a left join re-attaches
    docs with zero hits."""
    spark = df.sparkSession
    markers = [(tok, lang) for lang, toks in _LANG_MARKERS.items()
               for tok in toks]
    mdf = spark.createDataFrame(markers, "tok string, lang string")

    base = df.select(
        F.col(id_col).alias("__id"),
        F.col(text_col).rlike(r"[一-鿿]").alias("__zh"),
        F.col(text_col).rlike(r"[Ѐ-ӿ]").alias("__ru"))

    toks = (df.select(F.col(id_col).alias("__id"),
                      F.explode(F.split(normalized_text(text_col), " "))
                       .alias("tok")))
    hits = (toks.join(F.broadcast(mdf), "tok")
                .groupBy("__id")
                .agg(*[F.sum(F.when(F.col("lang") == l, 1).otherwise(0))
                        .alias(f"__h_{l}") for l in _LANG_MARKERS]))

    j = base.join(hits, "__id", "left").na.fill(
        0, [f"__h_{l}" for l in _LANG_MARKERS])
    h = {l: F.col(f"__h_{l}") for l in _LANG_MARKERS}
    best = F.greatest(*h.values())
    latin = (F.when(best == 0, F.lit("und"))
              .when(h["en"] == best, F.lit("en"))
              .when(h["es"] == best, F.lit("es"))
              .when(h["fr"] == best, F.lit("fr"))
              .otherwise(F.lit("de")))
    pred = (F.when(F.col("__zh"), F.lit("zh"))
             .when(F.col("__ru"), F.lit("ru"))
             .otherwise(latin))
    return j.select(F.col("__id").alias(id_col), pred.alias(out_col))


def select_token_budget(df: DataFrame, text_col: str, id_col: str,
                        budget_tokens: int,
                        quality_col=None,
                        bucket_decimals: int = 3,
                        max_boundary_task_rows: int = 2_000_000,
                        prefix_buckets: int = 64) -> DataFrame:
    """Token-budget corpus selection: keep the highest-quality documents
    until ``budget_tokens`` is exhausted — "give me the best 1B tokens",
    the final cut of a training-data pipeline. Deterministic total order:
    (rounded quality DESC, id ASC), a document is kept iff its inclusive
    running token total fits the budget.

    Scale shape — NO global-order window. The naive spelling
    (``sum(tokens) OVER (ORDER BY quality DESC)``) plans a WindowExec
    with no partition key: every row through ONE task. Instead:

    1. one aggregate: token totals per ROUNDED quality bucket (tiny);
    2. driver-side prefix sum over the sorted bucket histogram finds the
       cutoff bucket and the residual budget inside it (histogram-
       threshold trick — the same shape approx quantile uses);
    3. the scan keeps buckets strictly above the cutoff outright, and
       runs the running-sum window ONLY inside the boundary bucket
       (~1/buckets of the corpus, and that bound is tunable via
       ``bucket_decimals``);
    4. (r08) when the boundary bucket itself exceeds
       ``max_boundary_task_rows``, its running sum is a DISTRIBUTED
       PREFIX SUM instead of one single-task window: the bucket's id
       range (already in the histogram aggregate) splits into
       ``prefix_buckets`` deterministic id-range sub-buckets, one tiny
       per-sub-bucket aggregate feeds driver-side prefix offsets, and
       the window runs partitioned BY sub-bucket with the offset added
       back — no unpartitioned WindowExec anywhere in the plan, each
       task sees ~1/prefix_buckets of the boundary bucket. Sub-bucket
       identity is pure arithmetic on the id column (reproducible under
       any partitioning); NULL-running-sum semantics (leading NULL-token
       rows drop) are preserved exactly via nullable offsets. Set
       ``max_boundary_task_rows=0`` to force the distributed path.

    NULL handling: a NULL quality (e.g. NULL text) buckets to a NULL
    ``__qb``, which sorts LAST in the quality-DESC total order — the
    same NULLS-LAST placement Spark's ``desc()`` and DuckDB's default
    null order give the naive window spelling. NULL-quality documents
    are therefore considered last (lowest quality) and are kept only if
    budget remains after every real bucket; the cutoff landing in the
    NULL bucket is handled explicitly rather than conflated with the
    "everything fits" case.

    NULL-token contract (r12, closing the r11 ADVICE family): the naive
    window's running sum SKIPS NULL token counts and stays NULL until
    the first non-NULL one in the (quality DESC NULLS LAST, id) total
    order, and ``NULL <= budget`` keeps nothing — so a NULL-token row
    is kept iff SOME non-NULL-token row precedes it in that order (its
    running sum is then the prefix of real tokens). The histogram
    router reproduces this exactly: the per-bucket aggregate also
    records the min id of non-NULL-token rows, the driver locates the
    globally first non-NULL token, LEADING NULL-token rows (all-NULL
    buckets ahead of it, plus earlier ids inside its bucket) are
    filtered out of every branch — including the "everything fits"
    return and the kept-outright above-cutoff slice — and a
    NULL-running-sum row in the boundary bucket is KEPT when any
    non-NULL token exists in a higher bucket (its naive running sum is
    the above-bucket total, which fits by construction).

    Results equal the naive global-window spelling exactly (the declared
    query's DuckDB oracle IS that spelling), NULL-token corners
    included."""
    from pydata_vector_search_spark.functions.text import (quality_score,
                                                           token_count)
    from pyspark.sql import Window

    q = quality_col if quality_col is not None else quality_score(text_col)
    base = df.withColumn("__qb", F.round(q, bucket_decimals)) \
             .withColumn("__nt", token_count(text_col).cast("long"))
    # Materialize the (rows + quality-bucket + token-count) table ONCE
    # (r16 optimization): the histogram collect below is an EAGER job
    # over the full upstream lineage, and the kept-outright/boundary
    # branches then re-ran that lineage — including arbitrarily
    # expensive upstream chains (curate_corpus: cap -> dedup -> gate)
    # and the quality/token expressions — a second time at action
    # (executions never share exchanges). The checkpoint is the same
    # magnitude as the upstream chain's own shuffle files; its blocks
    # stay pinned while the returned plan is live (they are its source).
    base = base.localCheckpoint(eager=True)

    hist = (base.groupBy("__qb").agg(
                F.sum("__nt").alias("__bt"),
                F.count(F.lit(1)).alias("__bn"),
                F.min(F.col(id_col)).alias("__bmin"),
                F.max(F.col(id_col)).alias("__bmax"),
                F.min(F.when(F.col("__nt").isNotNull(), F.col(id_col)))
                 .alias("__bfirst"))
                .collect())
    # quality DESC, NULL bucket last (matches Spark desc() / DuckDB
    # default null order) — sorted driver-side so the placement never
    # depends on the engine's collect order.
    hist.sort(key=lambda r: (r["__qb"] is None,
                             -r["__qb"] if r["__qb"] is not None else 0.0))
    cum = 0
    found = False                 # distinct from cutoff=None == NULL bucket
    cutoff, residual, brow, cut_idx = None, 0, None, len(hist)
    for i, r in enumerate(hist):
        bt = r["__bt"] or 0       # all-NULL-token bucket sums to NULL
        if cum + bt <= budget_tokens:
            cum += bt
        else:
            found, cutoff, residual = True, r["__qb"], budget_tokens - cum
            brow, cut_idx = r, i
            break

    qb = F.col("__qb")
    # naive-window NULL-token contract (see docstring): find the bucket
    # holding the globally FIRST non-NULL token count; rows that
    # precede it in the total order are the leading NULL-token rows the
    # naive running sum drops (their cum is NULL), in EVERY branch.
    first_idx = next((i for i, r in enumerate(hist)
                      if r["__bt"] is not None), None)
    if first_idx is None:       # every token count NULL: naive keeps nothing
        return base.filter(F.lit(False)).drop("__qb", "__nt")
    fb = hist[first_idx]
    before_first = (qb.isNotNull() if fb["__qb"] is None
                    else qb.isNotNull() & (qb > fb["__qb"]))
    # eqNullSafe: a NULL __qb must read FALSE (not SQL NULL) against a
    # non-NULL first bucket, or `~leading` would drop NULL-quality rows
    in_first = (qb.isNull() if fb["__qb"] is None
                else qb.eqNullSafe(F.lit(fb["__qb"])))
    leading = before_first | (in_first & F.col("__nt").isNull()
                              & (F.col(id_col) < fb["__bfirst"]))
    # a NULL running sum inside the boundary bucket means "no non-NULL
    # token in the bucket prefix"; the naive global sum is then the
    # above-bucket token total — non-NULL (row kept; the total fits by
    # cutoff construction) iff some bucket above holds a real token.
    above_has_tokens = first_idx < cut_idx

    if not found:                           # whole corpus fits the budget
        return base.filter(~leading).drop("__qb", "__nt")

    if cutoff is None:           # boundary bucket IS the NULL-quality one:
        above = base.filter(qb.isNotNull() & ~leading)   # real buckets fit
        boundary_src = base.filter(qb.isNull())
    else:
        above = base.filter((qb > cutoff) & ~leading)  # NULL __qb excluded
        boundary_src = base.filter(qb == cutoff)

    def _keep_cum(c):
        return (c <= residual) | (c.isNull() & F.lit(above_has_tokens))

    if brow["__bn"] <= max_boundary_task_rows:
        # small boundary bucket: one bounded-size task is cheapest
        w = Window.orderBy(F.col(id_col).asc())
        boundary = (boundary_src
                    .withColumn("__cum", F.sum("__nt").over(w))
                    .filter(_keep_cum(F.col("__cum")))
                    .drop("__cum"))
        return above.unionByName(boundary).drop("__qb", "__nt")

    # distributed prefix sum: deterministic id-range sub-buckets (pure
    # arithmetic on the key — min/max came free with the histogram), one
    # tiny per-sub-bucket aggregate whose exclusive prefix offsets come
    # from a window over that aggregate (driver-free — the
    # domain_token_cap spelling, unified r11; the former driver-side
    # offsets dict chained up to prefix_buckets F.when branches into
    # the plan), then a PARTITIONED window + offset add-back.
    lo, hi = int(brow["__bmin"]), int(brow["__bmax"])
    width = max(1, (hi - lo) // prefix_buckets + 1)   # __pb in [0, K-1]
    idq = id_col.replace("`", "``")
    # exact LONG division (`div`), never through a double — ids beyond
    # 2^53 keep exact sub-bucket identity (same discipline as packing)
    pb = F.expr(f"(cast(`{idq}` as bigint) - {lo}L) div {width}L")
    # lazy-checkpoint the boundary slice so the quality/token-count
    # expressions evaluate over it ONCE: the sub-bucket aggregate below
    # materializes the blocks and the final windowed plan reuses them,
    # instead of re-running the base lineage a third time (r08 ADVICE).
    # Retention note: the blocks stay pinned for the session (they are
    # the returned plan's source); they are bounded at one quality
    # bucket — ~1/10^bucket_decimals of the corpus — not corpus-sized.
    bsrc = (boundary_src.withColumn("__pb", pb)
            .localCheckpoint(eager=False))
    # nullable running offsets preserve the single-window NULL contract:
    # a row's global cum is NULL iff NO non-NULL token precedes it
    # (leading-NULL rows drop on `NULL <= residual`, same as the
    # oracle). F.sum skips NULLs and returns NULL over an all-NULL (or
    # empty) frame, so the exclusive window below IS that semantics:
    # __off is NULL exactly until some preceding sub-bucket holds a
    # non-NULL token count. The offset window is over the sub-bucket
    # AGGREGATE (<= prefix_buckets rows), not corpus rows — its lack of
    # a partition key is bounded by construction.
    sstats = bsrc.groupBy("__pb").agg(F.sum("__nt").alias("__ps"))
    wp = Window.orderBy("__pb").rowsBetween(Window.unboundedPreceding, -1)
    offs = (sstats.withColumn("__off", F.sum("__ps").over(wp))
            .select(F.col("__pb").alias("__opb"), "__off"))
    w = Window.partitionBy("__pb").orderBy(F.col(id_col).asc())
    cum_in = F.sum("__nt").over(w)
    off = F.col("__off")
    cum_g = F.when(off.isNull(), cum_in) \
             .otherwise(off + F.coalesce(cum_in, F.lit(0)))
    boundary = (bsrc.join(offs, F.col("__pb").eqNullSafe(F.col("__opb")))
                    .withColumn("__cum", cum_g)
                    .filter(_keep_cum(F.col("__cum")))
                    .drop("__cum", "__pb", "__opb", "__off"))
    return above.unionByName(boundary).drop("__qb", "__nt")


def domain_token_cap(df: DataFrame, text_col: str, id_col: str,
                     domain_col: str, cap_tokens: int,
                     quality_col=None,
                     distributed: bool = False,
                     prefix_buckets: int = 64) -> DataFrame:
    """Per-DOMAIN token cap: within every ``domain_col`` group keep the
    highest-quality documents until that domain has spent
    ``cap_tokens`` tokens — the per-host/per-source downsampling gate
    web-crawl curation runs before global selection (a handful of
    boilerplate-heavy domains otherwise dominate the corpus; CCNet /
    RefinedWeb both cap per-domain mass). The quality-ordered HARD-cap
    complement of ``packing.temperature_mix(weight_col=...)``'s
    probabilistic share mixing, and the per-group sibling of
    ``select_token_budget``'s global cut.

    Deterministic total order per domain: (rounded quality DESC — NULLs
    last, like the global op — then id ASC); a document is kept iff its
    inclusive running token total fits the cap (NULL token counts add
    0).

    Scale shape, default path: ONE window partitioned by domain —
    domains shard across tasks, nothing global; for the
    many-modest-domains shape this gate exists for, that IS the right
    plan. A single WHALE domain, however, puts its rows through one
    task (the grouped-window bound ``operators/sampling`` documents) —
    and the salted top-n TOURNAMENT is provably LOSSY for a running-sum
    cap (a locally-over-cap doc removed at level 1 subtracts its token
    mass from every later doc's cumulative sum, so docs past the true
    boundary sneak back in — prefix sums are not order-local the way
    ranks are; pinned by a counterexample in tests). The whale-safe
    spelling is ``distributed=True``: the per-domain sibling of
    ``select_token_budget``'s histogram routing, with the driver-side
    histogram replaced by BUCKET-LEVEL WINDOWS so there is no
    per-domain driver state at all (a collected histogram would be
    |domains| x |buckets| rows — not metadata-sized at web scale):

    1. one aggregate: (domain, rounded-quality bucket) token totals +
       id ranges — map-side combinable, bucket-table-sized;
    2. a window over the BUCKET table partitioned by domain computes
       inclusive/exclusive running bucket totals in quality order —
       per-task input is one domain's bucket count, never its rows —
       and routes each bucket: fully-kept (inclusive total <= cap),
       boundary (exclusive <= cap < inclusive, residual = cap -
       exclusive; the <= keeps zero-token rows when a bucket boundary
       lands exactly on the cap), dropped;
    3. fully-kept buckets pass with one hash join; ONLY boundary-bucket
       rows run a running-sum window, partitioned by (domain, bucket,
       id-range sub-bucket) with per-sub-bucket offsets computed by a
       second bucket-level window (``prefix_buckets`` deterministic
       id-range slices — the ``select_token_budget`` r08 machinery,
       driver-free) — so no task ever sees more than
       ~|boundary bucket|/prefix_buckets rows, even when a whale
       domain's docs all share one quality value.

    The distributed branch needs an integral ``id_col`` for the
    id-range arithmetic (the same contract as ``select_token_budget``)
    and returns EXACTLY the default path's rows (equality pinned in
    tests, including the all-one-quality whale). Cost: two extra
    bucket-sized shuffles — insurance to buy when domains can exceed a
    task, not by default."""
    from pyspark.sql import Window

    from pydata_vector_search_spark.functions.text import (quality_score,
                                                           token_count)
    if cap_tokens < 0:
        raise ValueError(f"domain_token_cap: cap_tokens must be >= 0, "
                         f"got {cap_tokens}")
    q = quality_col if quality_col is not None else quality_score(text_col)
    base = (df.withColumn("__qb", F.round(q, 6))
              .withColumn("__nt", F.coalesce(
                  token_count(text_col).cast("long"), F.lit(0))))
    if not distributed:
        w = (Window.partitionBy(domain_col)
             .orderBy(F.col("__qb").desc_nulls_last(), F.col(id_col))
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        return (base.withColumn("__cum", F.sum("__nt").over(w))
                    .filter(F.col("__cum") <= cap_tokens)
                    .drop("__qb", "__nt", "__cum"))

    if prefix_buckets < 1:
        raise ValueError(f"domain_token_cap: prefix_buckets must be "
                         f">= 1, got {prefix_buckets}")
    from pyspark.sql import types as _T
    id_dt = df.schema[id_col].dataType
    if not isinstance(id_dt, (_T.ByteType, _T.ShortType, _T.IntegerType,
                              _T.LongType)):
        raise TypeError(
            f"domain_token_cap(distributed=True): id column {id_col!r} "
            f"has type {id_dt.simpleString()}; the id-range sub-bucket "
            "arithmetic needs an integral id — use the default path or "
            "derive a dense long id first")
    # the base lineage feeds the bucket aggregate AND both output
    # branches — materialize the quality/token expressions once
    # (the select_token_budget boundary_src lesson, r08 ADVICE)
    base = base.localCheckpoint(eager=False)
    dom, qb = F.col(domain_col), F.col("__qb")
    # 1. bucket stats (map-side combinable; bucket-table-sized)
    bstats = (base.groupBy(dom.alias("__d"), qb.alias("__b"))
              .agg(F.sum("__nt").alias("__bt"),
                   F.min(F.col(id_col).cast("long")).alias("__bmin"),
                   F.max(F.col(id_col).cast("long")).alias("__bmax")))
    # 2. bucket-level routing window: per-task input = one domain's
    # bucket count (<= distinct rounded qualities), never its rows
    wq = (Window.partitionBy("__d")
          .orderBy(F.col("__b").desc_nulls_last())
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    routed = (bstats
              .withColumn("__inc", F.sum("__bt").over(wq))
              .withColumn("__exc", F.col("__inc") - F.col("__bt")))
    keep_b = (routed.filter(F.col("__inc") <= cap_tokens)
              .select("__d", "__b"))
    bound_b = (routed.filter((F.col("__exc") <= cap_tokens)
                             & (F.col("__inc") > cap_tokens))
               .select("__d", "__b",
                       (F.lit(cap_tokens).cast("long") - F.col("__exc"))
                       .alias("__res"), "__bmin",
                       # exact LONG division (`div`), never through a
                       # double — ids beyond 2^53 keep exact sub-bucket
                       # identity (the select_token_budget discipline)
                       F.greatest(
                           F.lit(1).cast("long"),
                           F.expr(f"((__bmax - __bmin) div "
                                  f"{int(prefix_buckets)}L) + 1L"))
                       .alias("__width")))
    # NULL-safe join keys on BOTH columns: a NULL domain forms its own
    # group in the default path's window partitioning, and __qb is NULL
    # for NULL-quality docs — eqNullSafe keeps both joinable
    kept = base.join(keep_b, dom.eqNullSafe(F.col("__d"))
                     & qb.eqNullSafe(F.col("__b"))) \
               .drop("__d", "__b")
    # 3. boundary rows only: id-range sub-buckets + a second
    # bucket-level window for the exclusive prefix offsets (driver-free)
    brows = (base.join(bound_b, dom.eqNullSafe(F.col("__d"))
                       & qb.eqNullSafe(F.col("__b")))
             .withColumn("__pb",
                         F.expr(f"(cast(`{id_col.replace('`', '``')}` "
                                "as bigint) - __bmin) div __width"))
             .localCheckpoint(eager=False))
    sstats = (brows.groupBy("__d", "__b", "__pb")
              .agg(F.sum("__nt").alias("__ss")))
    wp = (Window.partitionBy("__d", "__b").orderBy("__pb")
          .rowsBetween(Window.unboundedPreceding, -1))
    # __d is NULL for the NULL domain and __b for the NULL-quality
    # bucket (both legitimate groups in the default path's window) — a
    # plain equi-join would silently drop their boundary rows, so every
    # key joins eqNullSafe (__pb included: a NULL id yields a NULL
    # sub-bucket, mirroring its NULLS-FIRST slot in the default order)
    offs = (sstats.withColumn("__off", F.coalesce(F.sum("__ss").over(wp),
                                                  F.lit(0).cast("long")))
            .select(F.col("__d").alias("__od"), F.col("__b").alias("__ob"),
                    F.col("__pb").alias("__opb"), "__off"))
    wi = (Window.partitionBy(F.col("__d"), F.col("__b"), F.col("__pb"))
          .orderBy(F.col(id_col))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    boundary = (brows.join(offs, F.col("__d").eqNullSafe(F.col("__od"))
                           & F.col("__b").eqNullSafe(F.col("__ob"))
                           & F.col("__pb").eqNullSafe(F.col("__opb")))
                .withColumn("__cum", F.col("__off")
                            + F.sum("__nt").over(wi))
                .filter(F.col("__cum") <= F.col("__res"))
                .drop("__d", "__b", "__pb", "__od", "__ob", "__opb",
                      "__off", "__cum", "__res", "__bmin", "__width"))
    return kept.unionByName(boundary).drop("__qb", "__nt")
