"""Multinomial Naive Bayes document classification — the corpus
quality/domain filter step of LLM data pipelines (the role fastText
linear classifiers play in CCNet/FineWeb-style curation: train on a
small labeled set, score the whole corpus, keep/route by predicted
class), built SQL-exact in the house style of ``lm_score.py``.

Why Naive Bayes and not MLlib LogisticRegression: NB's training IS a
pair of count aggregates (map-side combinable, one shuffle each) and
its scores are closed-form log-sums — so the whole train+score lineage
is deterministic, engine-independent (floored micro-nat integer
partials, the bm25/lm_score discipline), and hash-checkable against a
DuckDB oracle, while matching the discriminative baseline closely on
text classification (McCallum & Nigam, AAAI-98 workshop).

Scale shape (100 TB):
* TRAIN: one explode → (label, token) count aggregate + one per-label
  token-total aggregate. Both map-side combinable; the shuffle is
  vocabulary-sized, not corpus-sized.
* MODEL: the dense (token × label) log-likelihood table is
  |V|·|labels| rows — bounded by ``max_vocab`` hash-bucketing exactly
  like ``bigram_lm_score`` (rare tokens merge into buckets; with no
  collisions the scores are bit-identical to uncapped) — and
  BROADCASTS.
* SCORE: one corpus scan → explode → broadcast-hash join → per
  (doc, label) sum + struct-max argmax. Tokens never seen in training
  contribute the class's smoothed default, accounted in closed form
  from per-doc token totals (no dense miss rows are materialized).
  The corpus shuffles once, on (doc, label) partial sums.

Ties: argmax breaks by (score, label) struct-max — the larger label
wins an exact score tie; replayable as ``ORDER BY score DESC, label
DESC`` in any engine.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from pydata_vector_search_spark.functions.text import normalized_text

_SCALE = 1_000_000.0            # micro-nat integer partials (lm_score)


def _tokens(text_col: str) -> F.Column:
    t = F.coalesce(normalized_text(text_col), F.lit(""))
    return F.filter(F.split(t, " "), lambda w: F.length(w) > 0)


def _bucket(tok: F.Column, max_vocab: int) -> F.Column:
    """md5-derived bucket id as string — deterministic, cross-engine
    (same family as lm_score's _vocab_bucket)."""
    h = F.conv(F.substring(F.md5(tok), 1, 15), 16, 10).cast("long")
    return (h % max_vocab).cast("string")


@dataclass
class NBModel:
    """Broadcastable model tables (all tiny relative to the corpus):
    ``dense``: (token, label, llh_micro) — smoothed log-likelihood of
    every TRAINING token under every label, floored micro-nats;
    ``classes``: (label, prior_micro, default_micro) — log prior and
    the per-occurrence default for tokens unseen in training.
    ``vocab_size`` is the eager |V| from training — ``nb_score`` gates
    its broadcast on it (see BROADCAST_SAFE_VOCAB)."""
    dense: DataFrame
    classes: DataFrame
    smoothing: float
    max_vocab: int | None
    vocab_size: int = 0
    # the persisted (label, token) count table the dense lineage reads —
    # vocabulary-sized, materialized once in nb_train (see comment there)
    _counts: DataFrame | None = None

    def unpersist(self) -> None:
        """Release the cached training-count table (the model's dense
        lineage recomputes from the corpus afterwards)."""
        if self._counts is not None:
            self._counts.unpersist()


# Above this |V| the dense (token × label) table stops being broadcast
# in nb_score and joins as a regular shuffle join instead: at 2M tokens
# × a handful of labels the broadcast payload crosses the ~hundreds-of-
# MB band where per-executor duplication beats the one shuffle it saves.
# Training on an unbounded web corpus with max_vocab=None is the one
# way to get here (the r08 ADVICE scenario) — the scores stay correct
# either way; only the join strategy changes. Callers who want a
# bounded model at any corpus size pass ``max_vocab`` (the facade's
# ``Engine.classify`` defaults it finite for exactly this reason).
BROADCAST_SAFE_VOCAB = 2_000_000


def nb_train(df: DataFrame, text_col: str, label_col: str,
             smoothing: float = 1.0,
             max_vocab: int | None = None) -> NBModel:
    """Train multinomial NB:  p(tok | c) = (count(tok, c) + a) /
    (tokens(c) + a * V),  prior(c) = docs(c) / docs.  All logs stored
    as ``floor(ln(p) * 1e6 + 0.5)`` longs so any engine reproduces the
    exact same integers.

    NOTE: training is EAGER — |V| and the doc count are collected at
    call time (two aggregates over the training set; the training set
    is the small labeled side of the pipeline, not the corpus). The
    returned model's tables stay lazy until scoring."""
    if smoothing <= 0:
        raise ValueError(f"nb_train: smoothing must be > 0, "
                         f"got {smoothing}")
    toks = df.select(F.col(label_col).alias("__y"),
                     _tokens(text_col).alias("__tk"))
    if max_vocab is not None and max_vocab < 1:
        raise ValueError(f"nb_train: max_vocab must be >= 1, "
                         f"got {max_vocab}")
    # Bucket AFTER the explode, as a scalar column: higher-order-function
    # lambdas run interpreted (~9 µs/element — the fingerprint.py
    # measurement), so an md5 per token inside F.transform pays the
    # interpreter on every occurrence; the same _bucket expression over
    # the exploded column runs inside whole-stage codegen. Values are
    # identical — bucketing is per-token and explode preserves
    # occurrences (r16 optimization; guide §4.1).
    occ = toks.select("__y", F.explode("__tk").alias("__w"))
    if max_vocab is not None:
        occ = occ.select("__y", _bucket(F.col("__w"), max_vocab)
                         .alias("__w"))
    # The ONLY corpus-sized aggregate in training. Everything else —
    # |V|, per-class token totals, the vocab spine of the dense table —
    # derives from this (label × token)-sized result, so persist it:
    # it is the same magnitude as the model itself (<= max_vocab·|labels|
    # rows when capped, |V|·|labels| otherwise), and without the persist
    # the eager |V| count below AND the scoring join would each re-run
    # the corpus explode-aggregate (measured 3.9 -> 2.x s on nb_classify
    # at sf0.1). Freed via NBModel.unpersist().
    counts = occ.groupBy("__y", "__w").agg(
        F.count(F.lit(1)).alias("__c")).persist()
    vocab = counts.select("__w").distinct()
    v = vocab.count()                      # |V| — materializes counts
    per_class = counts.groupBy("__y").agg(
        F.sum("__c").alias("__nt"))
    n_docs = toks.count()                  # count-star: column-pruned scan
    priors = toks.groupBy("__y").agg(F.count(F.lit(1)).alias("__nd"))

    a = float(smoothing)
    mk = lambda p: F.floor(F.log(p) * _SCALE + F.lit(0.5)).cast("long")  # noqa: E731
    classes = (priors.join(per_class, "__y", "left")
               .na.fill(0, ["__nt"])
               .select(F.col("__y").alias("label"),
                       mk(F.col("__nd").cast("double") / F.lit(n_docs))
                       .alias("prior_micro"),
                       mk(F.lit(a) / (F.col("__nt") + F.lit(a * v)))
                       .alias("default_micro"),
                       F.col("__nt").alias("__nt")))
    cts = counts.select(F.col("__w").alias("__cw"),
                        F.col("__y").alias("__cy"), "__c")
    dense = (vocab.select(F.col("__w").alias("token"))
             .crossJoin(F.broadcast(classes.select("label", "__nt")))
             .join(cts, (F.col("token") == F.col("__cw"))
                   & (F.col("label") == F.col("__cy")), "left")
             .select("token", "label",
                     mk((F.coalesce(F.col("__c"), F.lit(0)) + F.lit(a))
                        / (F.col("__nt") + F.lit(a * v)))
                     .alias("llh_micro")))
    return NBModel(dense=dense,
                   classes=classes.drop("__nt"),
                   smoothing=a, max_vocab=max_vocab, vocab_size=v,
                   _counts=counts)


def nb_score(df: DataFrame, model: NBModel, text_col: str, id_col: str,
             out_label: str = "pred_label",
             out_score: str = "score_micro") -> DataFrame:
    """(id, pred_label, score_micro) — argmax-class and its exact
    integer log-score for every document. score(d, c) = prior(c) +
    SUM over seen token occurrences of llh(tok, c) + (unseen
    occurrences) * default(c); empty documents score prior only."""
    toks = df.select(F.col(id_col).alias("__id"),
                     _tokens(text_col).alias("__tk"))
    # ``__n`` counts occurrences, which bucketing does not change, so the
    # size comes off the RAW token array and the md5 bucket runs as a
    # codegen scalar on the exploded column instead of an interpreted
    # F.transform over every array (see nb_train; r16 optimization).
    base = toks.select("__id", F.size("__tk").alias("__n"), "__tk")
    occ = base.select("__id", F.explode("__tk").alias("token"))
    if model.max_vocab is not None:
        occ = occ.select("__id", _bucket(F.col("token"), model.max_vocab)
                         .alias("token"))
    # broadcast only while the dense table is provably small (|V| is
    # known exactly from training — no estimate needed); past the bound
    # fall back to a shuffle join rather than ship an unbounded model
    # to every executor (r08 ADVICE: max_vocab=None on a huge training
    # set must degrade to a slower plan, not an OOM)
    dense = (F.broadcast(model.dense)
             if model.vocab_size <= BROADCAST_SAFE_VOCAB
             else model.dense)
    seen = (occ.join(dense, "token")
               .groupBy("__id", "label")
               .agg(F.sum("llh_micro").alias("__s"),
                    F.count(F.lit(1)).alias("__k")))
    # every doc × every class (docs with zero seen tokens still score):
    # a BROADCAST crossJoin against the |labels|-row class table — row
    # expansion is exactly |labels|× the corpus (a handful of classes
    # in any curation recipe), never corpus × corpus
    grid = (base.select("__id", "__n")
            .crossJoin(F.broadcast(model.classes)))
    scored = (grid.join(seen, ["__id", "label"], "left")
              .select("__id", "label",
                      (F.col("prior_micro")
                       + F.coalesce(F.col("__s"), F.lit(0))
                       + (F.col("__n")
                          - F.coalesce(F.col("__k"), F.lit(0)))
                       * F.col("default_micro")).alias("__score")))
    best = (scored.groupBy("__id")
            .agg(F.max(F.struct(F.col("__score"),
                                F.col("label"))).alias("__b")))
    return best.select(F.col("__id").alias(id_col),
                       F.col("__b.label").alias(out_label),
                       F.col("__b.__score").alias(out_score))
