"""Sub-document exact deduplication: paragraph-level and substring-span.

Document-level dedup (operators/dedup.py) removes whole near-identical
documents; real LLM pipelines ALSO dedup below the document boundary,
because boilerplate (headers, license blocks, navigation text) and
copied passages survive document-level filtering:

* **paragraph dedup** — the Dolma / RefinedWeb / C4 rule: a paragraph
  (or line) that has already appeared anywhere in the corpus is removed;
  exactly one occurrence — the first in a deterministic global order —
  is kept.  `paragraph_dedup`.
* **exact substring (span) dedup** — Lee et al. 2021, "Deduplicating
  Training Data Makes Language Models Better": any span of >= n tokens
  that appears more than once in the corpus is removed from every
  position except its first occurrence.  The published implementation
  builds a corpus-wide suffix array — inherently single-machine.  The
  Spark-first equivalent here keys every length-n token window by hash
  and keeps the min-(doc, pos) occurrence; overlapping duplicate
  windows merge into maximal removed intervals, which reproduces the
  ">= n tokens duplicated" semantics of the suffix-array formulation
  (a duplicated run of length L >= n is covered by L-n+1 duplicated
  windows whose union is the whole run).  `duplicate_span_dedup`.

Determinism / oracle contract: nothing random anywhere.  The keep rule
is "lexicographically smallest (doc_id, position)" per content key, so
any engine that can group by exact text reproduces the result
bit-for-bit; md5 (128-bit) is used as the grouping key only to avoid
shuffling full paragraph text, and the DuckDB oracle groups by the raw
text itself — a hash collision would therefore surface as a
correctness failure rather than hide.

Scale notes (100 TB):
* Both operators are two-shuffle pipelines: one groupBy on the content
  key (map-side combinable min — partial aggregation absorbs the hot
  boilerplate keys), one groupBy doc_id to reassemble.  No self-join,
  no window over the whole corpus.
* The join that tags duplicate occurrences is (occurrences x 1-row-per-
  key firsts); a viral paragraph/gram makes the left side hot but the
  right side stays one row per key — AQE skew-join splits the straggler
  partition.  Work stays linear in total occurrences.
* Everything is built-in Catalyst expressions (split / slice /
  zip_with / posexplode / higher-order filter) — whole-stage codegen,
  no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from pydata_vector_search_spark.functions.text import normalized_text

# (doc, position) packed into ONE long for the first-occurrence min:
# min(struct) compiles to SortAggregate (struct buffers aren't
# HashAggregate-able), while min(long) is a map-side-combinable
# HashAggregate — the difference between sorting and hashing the
# dominant content-key shuffle at 100 TB. Packing is order-isomorphic
# ((d1,p1) <lex (d2,p2)  <=>  d1*LIFT+p1 < d2*LIFT+p2) provided
# pos < LIFT AND 0 <= id < 2^41 (long overflow headroom at *2^22).
# BOTH preconditions are raise_error-enforced at runtime: a >4M-token
# document, a negative id, or a 64-bit hash id beyond 2^41 is
# pathological input for this packing, not a silent wrong answer —
# unchecked, an oversized id would wrap around in non-ANSI long
# multiplication and silently corrupt the first-occurrence min.
_POS_LIFT = 1 << 22
_ID_LIMIT = 1 << 41


def _pack(id_col: str, pos: Column) -> Column:
    idc = F.col(id_col).cast("long")
    packed = idc * F.lit(_POS_LIFT) + pos
    ok = (pos < _POS_LIFT) & (idc >= 0) & (idc < _ID_LIMIT)
    return (F.when(ok, packed)
             .otherwise(F.raise_error(F.concat(F.lit(
                 f"span_dedup: cannot pack (doc, pos) key — need "
                 f"pos < {_POS_LIFT} and 0 <= id < {_ID_LIMIT}, got "
                 f"(id, pos) = ("), idc.cast("string"), F.lit(", "),
                 pos.cast("string"), F.lit(")")))
                 .cast("long")))


# --------------------------------------------------------------------------
# paragraph-level exact dedup (Dolma / RefinedWeb / C4 rule)
# --------------------------------------------------------------------------

def paragraph_dedup(df: DataFrame, text_col: str, id_col: str,
                    sep: str = "\n", join_sep: str = "\n",
                    min_chars: int = 1) -> DataFrame:
    """Remove every paragraph whose exact text already occurred earlier
    in the corpus; keep the first occurrence in (id, position) order.

    ``sep`` is the split regex (paragraph boundary); ``join_sep`` the
    literal separator used to reassemble surviving paragraphs in their
    original order.  Units shorter than ``min_chars`` characters are
    never dedup candidates (always kept) — the standard guard that stops
    empty lines / one-char fragments from being "deduplicated" away.

    Returns one row per input document: ``(id_col, text_col,
    n_units, n_kept)`` where ``text_col`` is the rebuilt text (empty
    string when every unit was removed).
    """
    # NULL text behaves as empty text (split(NULL) explodes to zero rows,
    # which would silently DROP the document from the output)
    #
    # Materialization barrier (r07): ``units`` feeds three consumers
    # (dedup candidates, the always-kept short units, per-doc totals) —
    # without it Catalyst re-runs the corpus scan + split + posexplode
    # once per consumer (measured 1.8 s vs 0.9 s at sf0.1). One lazy
    # localCheckpoint stores the exploded units in the block manager —
    # volume comparable to the content-key shuffle the op pays anyway —
    # and the two extra evaluations become local reads. Same
    # lineage-barrier discipline as graph.py's CC loop.
    units = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.coalesce(F.col(text_col), F.lit("")), sep))
         .alias("__pos", "__u")).localCheckpoint(eager=False)
    cand = units.filter(F.length("__u") >= min_chars) \
                .withColumn("__h", F.md5("__u")) \
                .withColumn("__dp", _pack(id_col, F.col("__pos")))
    firsts = cand.groupBy("__h").agg(F.min("__dp").alias("__first"))
    kept_cand = (cand.join(firsts, "__h")
                     .filter(F.col("__dp") == F.col("__first"))
                     .select(id_col, "__pos", "__u"))
    always = units.filter(F.length("__u") < min_chars) \
                  .select(id_col, "__pos", "__u")
    kept = kept_cand.unionByName(always)

    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__pos", "__u"))),
                lambda s: s["__u"]),
            join_sep).alias("__text"),
        F.count(F.lit(1)).cast("long").alias("n_kept"))
    totals = units.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_units"))

    # left joins from the per-doc totals: a document whose every unit was
    # removed still comes back (empty text, n_kept = 0)
    return (totals.join(rebuilt, id_col, "left")
                  .select(id_col,
                          F.coalesce("__text", F.lit("")).alias(text_col),
                          "n_units",
                          F.coalesce("n_kept", F.lit(0)).alias("n_kept")))


# --------------------------------------------------------------------------
# exact substring (token-span) dedup — Lee et al. 2021, Spark-first
# --------------------------------------------------------------------------

def _gram_col(toks, n: int):
    """Length-n token windows as strings, O(T) per row: n shifted slices
    zipped with concat (the shingles_col trick, but positional — windows
    keep their start offset and duplicates are NOT collapsed)."""
    m = F.size(toks) - (n - 1)
    parts = [F.slice(toks, i + 1, m) for i in range(n)]
    grams = parts[0]
    for p in parts[1:]:
        grams = F.zip_with(grams, p, lambda a, b: F.concat(a, F.lit(" "), b))
    return F.when(m >= 1, grams).otherwise(
        F.array().cast("array<string>"))


def duplicate_span_dedup(df: DataFrame, text_col: str, id_col: str,
                         n: int = 8) -> DataFrame:
    """Remove all but the first occurrence of every duplicated token
    span of length >= ``n`` (whitespace tokens of the normalized text).

    A window of ``n`` consecutive tokens is *duplicated* when the same
    token sequence occurs at a lexicographically smaller (doc, start).
    Duplicate window starts in a document cover token intervals
    ``[start, start+n)``; overlapping intervals merge (sort + running-
    max window per document — parallel across documents), and the
    merged intervals' tokens are dropped from the rebuilt text.

    Returns one row per input document: ``(id_col, text_col,
    n_tokens, n_removed, n_spans)`` — rebuilt text (space-joined
    surviving tokens of the normalized form), total token count,
    removed token count, and the number of maximal removed spans.
    """
    from pydata_vector_search_spark.operators.dedup import _fan_out

    # Fan out on the doc id first: the per-row work below (interpreted
    # zip_with gram build + one md5 per token window) is winnow-class
    # heavy, and a single-row-group parquet input would run it all on
    # one core (fingerprint.py r13 lesson). Measured at sf0.1: 2.4-2.9
    # -> 1.2-1.3 s warm, identical outputs. The id hash layout is also
    # what the interval-merge window needs later.
    df = _fan_out(df, id_col)
    # NULL text behaves as empty text (NULL would propagate through the
    # token array into NULL stats instead of the documented zeros)
    base = df.select(
        F.col(id_col),
        F.split(normalized_text(F.coalesce(F.col(text_col), F.lit(""))),
                " ").alias("__toks"))
    occ = base.select(
        id_col,
        F.posexplode(_gram_col(F.col("__toks"), n)).alias("__start", "__g"))
    keyed = occ.select(id_col, "__start", F.md5("__g").alias("__h"),
                       _pack(id_col, F.col("__start")).alias("__dp"))
    firsts = keyed.groupBy("__h").agg(F.min("__dp").alias("__first"))
    dup = (keyed.join(firsts, "__h")
                .filter(F.col("__dp") != F.col("__first"))
                .select(id_col, "__start",
                        (F.col("__start") + n).alias("__end")))

    # merge overlapping [start, end) intervals per doc: running max of
    # prior ends marks island boundaries (classic gaps-and-islands)
    w = Window.partitionBy(id_col).orderBy("__start")
    prev_end = F.max("__end").over(
        w.rowsBetween(Window.unboundedPreceding, -1))
    island = F.sum(
        F.when(F.col("__start") > F.coalesce(prev_end, F.lit(-1)), 1)
         .otherwise(0)).over(w.rowsBetween(Window.unboundedPreceding, 0))
    merged = (dup.withColumn("__isl", island)
                 .groupBy(id_col, "__isl")
                 .agg(F.min("__start").alias("s"), F.max("__end").alias("e")))
    ivs = merged.groupBy(id_col).agg(
        F.sort_array(F.collect_list(F.struct("s", "e"))).alias("__ivs"))

    joined = base.join(ivs, id_col, "left").select(
        id_col, "__toks",
        F.coalesce("__ivs", F.array().cast(
            "array<struct<s:int,e:int>>")).alias("__ivs"))
    covered = lambda i: F.exists(        # noqa: E731 — HOF predicate
        F.col("__ivs"), lambda iv: (i >= iv["s"]) & (i < iv["e"]))
    kept = F.filter(F.col("__toks"), lambda x, i: ~covered(i))
    return joined.select(
        id_col,
        F.array_join(kept, " ").alias(text_col),
        F.size("__toks").cast("long").alias("n_tokens"),
        (F.size("__toks") - F.size(kept)).cast("long").alias("n_removed"),
        F.size("__ivs").cast("long").alias("n_spans"))
