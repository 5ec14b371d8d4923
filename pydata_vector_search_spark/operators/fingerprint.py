"""Winnowing document fingerprints (Schleimer, Kleinberg, Aiken —
"Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD'03).

The classic sub-document fingerprinting scheme behind MOSS-style
near-dup / plagiarism detection, complementing the whole-document
``fingerprint_md5`` and the shingle-set Jaccard family: hash every
character k-gram of the normalized text, then keep the MINIMUM hash of
each sliding window of ``w`` consecutive k-gram hashes. The paper's
guarantee: any shared substring of length >= k + w - 1 contributes at
least one shared fingerprint, while the selection density is ~2/(w+1)
of all k-grams — a tunable sketch that detects local overlap without
storing every shingle.

Design (100 TB shape):
* Fingerprint extraction EXPLODES gram positions to rows so the k-gram
  hash runs inside whole-stage codegen, then takes the per-window
  sliding minimum as a doc-partitioned frame window (``min OVER (ROWS
  BETWEEN CURRENT ROW AND w-1 FOLLOWING)``). An all-array spelling
  (``transform(sequence(...))`` + per-window ``array_min``) avoids the
  doc-keyed exchange entirely but runs every hash in the INTERPRETED
  higher-order-function path — measured ~9 µs/element (hash choice
  irrelevant: md5 12.8 s vs xxhash 12.1 s for 1.4 M grams at sf0.1)
  vs ~3× faster end-to-end for explode+window with the hash codegen'd.
  The exchange is narrow (id, pos, hash — ~24 B/gram) and partitions
  by doc, so it scales with corpus characters, which any winnowing
  must touch anyway.
* K-gram hashes are md5-derived 32-bit values (top 8 hex chars), the
  cross-engine hash family this repo's oracles replay — so even the
  SELECTION (which k-gram wins each window) is engine-independent and
  DuckDB can replay it verbatim.
* Pairing is the same bounded equi-join discipline as the Jaccard /
  MinHash family: explode fingerprints, optional hot-fingerprint cap
  (``max_fp_df`` — a boilerplate k-gram shared by everything generates
  df² candidate tuples; the cap drops it from candidate generation
  only), equi-join on the fingerprint, per-pair shared count. Never
  corpus².

Deliberate simplification vs the paper: fingerprints are recorded as a
DISTINCT set of winning hash VALUES (positions dropped, so the
rightmost-tie rule is irrelevant) — the robust-winnowing position
refinements affect match LOCALIZATION, not pair detection, and a value
set keeps the operator a pure Column pipeline on both engines.

Reference scope note: the reference (andywalner/pydata_vector_search,
demo.ipynb) has no sub-document fingerprinting; this extends the
LLM-data-pipeline mandate ("document fingerprinting (rolling hash)")
with the standard published algorithm.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from pydata_vector_search_spark.functions.text import normalized_text


def _h32(s: F.Column) -> F.Column:
    """md5-derived 32-bit hash — cross-engine: DuckDB spells it
    ``('0x' || substr(md5(s), 1, 8))::BIGINT``."""
    return F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long")


def winnow_fingerprints(df: DataFrame, text_col: str, id_col: str,
                        k: int = 8, window: int = 4,
                        fp_col: str = "fp") -> DataFrame:
    """(id, fp) — one row per DISTINCT winnowing fingerprint of every
    document: the min md5 hash of each sliding window of ``window``
    consecutive character ``k``-gram hashes over the normalized text.

    Short-text fallbacks keep every document represented: fewer than
    ``k`` characters → the whole text hashes as the single gram; fewer
    grams than ``window`` → one window over all grams (both replayed
    identically by the SQL oracle). NULL text normalizes to ''."""
    if k < 1 or window < 1:
        raise ValueError(f"winnow_fingerprints: k and window must be "
                         f">= 1, got k={k} window={window}")
    from pyspark.sql import Window

    # Repartition on the doc id BEFORE the explode — UNCONDITIONALLY,
    # unlike the guarded dedup._fan_out: here the pre-explode shuffle
    # carries (id, text) (~1 byte/char) and its hash layout satisfies
    # the sliding-min window's clustering, so the window adds NO
    # exchange of the exploded gram stream (~28 bytes/char — one
    # (id, pos, hash) row per character position). At ANY scale and
    # any input split this trades the strictly larger shuffle for the
    # smaller one; on a single-row-group local input it additionally
    # un-serializes the per-gram md5 pipeline (fingerprint stage
    # 3.17 s -> 0.56 s at sf0.1, identical 402,382 rows). Target is
    # max(cores, shuffle.partitions) — the traded exchange would have
    # run at shuffle.partitions, so the replacement must not carry
    # LESS parallelism (session.traded_shuffle_partitions).
    from ..session import traded_shuffle_partitions
    df = df.repartition(traded_shuffle_partitions(df.sparkSession),
                        F.col(id_col))
    t = F.coalesce(normalized_text(text_col), F.lit(""))
    # Gram count clamped to >= 1: for texts shorter than k,
    # substring(t, 1, k) IS the whole text, so position 1 degenerates
    # to the hash-the-whole-text fallback with no special casing; the
    # same clamp on the window filter keeps one all-gram window when
    # there are fewer grams than `window`.
    base = df.select(
        F.col(id_col).alias(id_col), t.alias("__t"),
        F.greatest(F.length(t) - F.lit(k - 1), F.lit(1)).alias("__ng"))
    pos = base.select(
        id_col, "__t", "__ng",
        F.explode(F.sequence(F.lit(1), F.col("__ng"))).alias("__p"))
    hashed = pos.select(
        id_col, "__ng", "__p",
        _h32(F.substring(F.col("__t"), F.col("__p"), k)).alias("__h"))
    win = (Window.partitionBy(id_col).orderBy("__p")
                 .rowsBetween(0, window - 1))
    return (hashed
            .withColumn("__m", F.min("__h").over(win))
            .filter(F.col("__p") <= F.greatest(
                F.col("__ng") - F.lit(window - 1), F.lit(1)))
            .select(id_col, F.col("__m").alias(fp_col))
            .distinct())


def fingerprint_neardup_pairs(df: DataFrame, text_col: str, id_col: str,
                              k: int = 8, window: int = 4,
                              min_shared: int = 5,
                              max_fp_df: int | None = None) -> DataFrame:
    """(id_1, id_2, n_shared) — document pairs sharing at least
    ``min_shared`` winnowing fingerprints (each shared fingerprint
    witnesses a shared substring of length >= k; >= k+window-1 overlaps
    are guaranteed to be witnessed). ``max_fp_df`` drops fingerprints
    appearing in more than that many documents from candidate
    GENERATION (boilerplate guard — the standard skew cap of the dedup
    family; detection of pairs sharing rarer fingerprints is
    unaffected, but pairs held together ONLY by hot fingerprints fall
    below ``min_shared``)."""
    # NO extra barrier here (r16): winnow_fingerprints already ends in
    # .distinct() — a hash exchange + aggregate — so its attributes are
    # materialized and every consumer (the df-cap join and both sides
    # of the self-join) reads that one exchange as ReusedExchange. The
    # former round-robin _barrier added a THIRD full shuffle of the
    # (id, fp) set on top for nothing (measured 2.0-3.0 -> 1.3-1.7 s
    # warm for the pair pipeline at sf0.1, identical 224 pairs).
    fp = winnow_fingerprints(df, text_col, id_col, k=k, window=window)
    if max_fp_df is not None:
        dfreq = (fp.groupBy("fp").agg(F.count(F.lit(1)).alias("__df"))
                   .filter(F.col("__df") <= max_fp_df))
        fp = fp.join(dfreq.select("fp"), "fp")
    a, b = fp.alias("a"), fp.alias("b")
    return (a.join(b, (F.col("a.fp") == F.col("b.fp"))
                   & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
             .groupBy(F.col(f"a.{id_col}").alias("id_1"),
                      F.col(f"b.{id_col}").alias("id_2"))
             .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
             .filter(F.col("n_shared") >= min_shared))
