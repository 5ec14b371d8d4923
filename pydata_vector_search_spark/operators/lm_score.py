"""Corpus-statistics quality scoring: n-gram LM perplexity and DSIR.

Two published data-selection signals every large pretraining pipeline
computes, re-expressed Spark-first:

* **bigram LM scoring** — the CCNet idea (Wenzek et al. 2020): score
  each document by its per-token negative log-likelihood under a
  language model; low-likelihood docs are gibberish, extremely
  high-likelihood docs are boilerplate.  CCNet uses a pretrained KenLM;
  the public, self-contained analog here trains an interpolated
  unigram/bigram model on the corpus itself in one pass and scores
  every document under it.  `bigram_lm_score`.
* **DSIR importance weighting** — Xie et al. 2023, "Data Selection for
  Language Models via Importance Resampling": documents are featurized
  into hashed n-gram buckets; each doc's importance weight is
  ``sum_g log(p_target(g) / p_raw(g))`` under smoothed bucket unigram
  models of a small target corpus vs the raw pool, and the top-weighted
  docs are selected.  (The paper adds Gumbel noise to sample; the
  deterministic top-k by weight implemented here is the reproducible
  variant — noise is a caller-side concern.)  `dsir_importance`.

Float determinism (the oracle contract): per-token/per-gram log terms
are floored to integer micro-nats (``floor(x*1e6 + 0.5)`` longs — the
bm25 convention from operators/retrieval.py) before summing, so the
per-document sums are order-independent and bit-equal across engines
regardless of partitioning; only a final exact long (or a single
long/long division) leaves the operator.

Scale notes (100 TB):
* `bigram_lm_score` is two corpus scans (count n-grams, score) with
  groupBy/join keyed on tokens and token pairs — map-side combinable
  counts, AQE handles hot-token skew.  The count tables are
  vocabulary-sized, not corpus-sized; at web scale pass ``max_vocab``
  to hash the vocabulary into a bounded bucket space (CCNet bounds the
  same way via its fixed KenLM vocab — rare tokens share buckets, the
  hashed analog of an OOV symbol), making the unigram table provably
  <= max_vocab rows and the bigram table <= max_vocab^2 (in practice
  ~observed-bigram-sized).  Same md5 bucket trick as
  ``dsir_importance`` — deterministic on every engine.
* `dsir_importance` hashes grams into ``num_buckets`` (1e4 default)
  buckets, so BOTH models are fixed-size tables broadcast to every
  executor: one explode + broadcast join + per-doc sum — the corpus
  itself never shuffles, which is the whole point of DSIR's hashed
  features.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from pydata_vector_search_spark.operators.dedup import tokens_col

_SCALE = 1_000_000          # micro-nats: floor(x*1e6 + .5) integer partials


def _bigrams_col(toks):
    """Adjacent token pairs 'w1 w2', O(T) per row (shifted-slice zip)."""
    m = F.size(toks) - 1
    a = F.slice(toks, 1, m)
    b = F.slice(toks, 2, m)
    pairs = F.zip_with(a, b, lambda x, y: F.concat(x, F.lit(" "), y))
    return F.when(m >= 1, pairs).otherwise(F.array().cast("array<string>"))


def _vocab_bucket(tok):
    """Deterministic md5 hash-bucket label for one token (string form so
    the bucketed 'vocabulary' flows through the unchanged token-keyed
    pipeline). Mirrors dsir_importance's bucket expression."""
    return F.conv(F.substring(F.md5(tok), 1, 8), 16, 10).cast("long")


def bigram_lm_score(df: DataFrame, text_col: str, id_col: str,
                    lam: float = 0.8,
                    max_vocab: int | None = None) -> DataFrame:
    """Per-document average negative log-likelihood (nats/bigram) under
    an interpolated unigram/bigram LM trained on the corpus itself:

        p(w2 | w1) = lam * c(w1 w2)/c(w1) + (1-lam) * c(w2)/N

    Returns one row per document with at least one bigram:
    ``(id_col, n_bigrams, nll_micro)`` where ``nll_micro`` is the exact
    integer sum of per-bigram ``floor(-ln(p)*1e6 + 0.5)`` — divide by
    ``1e6 * n_bigrams`` for nats/bigram, exponentiate for perplexity.
    The interpolation backs off to the unigram model, so p > 0 for any
    pair of in-corpus tokens and no extra smoothing is needed (every
    scored token is in-corpus here because the model trains on the same
    corpus it scores).

    ``max_vocab`` (default off) hashes every token into a bounded
    bucket space before training AND scoring — the web-scale guard that
    makes the unigram count table provably <= max_vocab rows no matter
    how large the real vocabulary grows (KenLM's fixed vocab plays this
    role in CCNet; hashing is its deterministic, shuffle-free analog —
    rare tokens collide into shared buckets, which is exactly an OOV
    bucket smeared across the hash space). With no bucket collisions
    the capped score equals the uncapped score bit-for-bit (the
    bucketing is then a bijective token relabeling and every count is
    unchanged); collisions only ever merge counts, which is the same
    information loss an explicit OOV symbol accepts."""
    toks = df.select(F.col(id_col), tokens_col(text_col).alias("__toks"))
    if max_vocab is not None:
        if max_vocab < 1:
            raise ValueError(f"bigram_lm_score: max_vocab must be >= 1, "
                             f"got {max_vocab}")
        toks = toks.withColumn(
            "__toks",
            F.transform("__toks",
                        lambda t: (_vocab_bucket(t) % max_vocab)
                        .cast("string")))

    uni = (toks.select(F.explode("__toks").alias("__w"))
               .groupBy("__w").agg(F.count(F.lit(1)).alias("__c1")))
    # total token occurrences = the sum of the unigram counts — derive it
    # from the vocabulary-sized ``uni`` table instead of tokenizing the
    # corpus a second time (same value by construction)
    n_total = uni.agg(F.sum("__c1").cast("double").alias("__n"))

    bi_occ = toks.select(
        id_col, F.explode(_bigrams_col(F.col("__toks"))).alias("__bg"))
    bi = bi_occ.groupBy("__bg").agg(F.count(F.lit(1)).alias("__c12"))

    w1 = F.split("__bg", " ")[0]
    w2 = F.split("__bg", " ")[1]
    scored_grams = (bi
                    .join(uni.select(F.col("__w").alias("__w1k"),
                                     F.col("__c1").alias("__cw1")),
                          w1 == F.col("__w1k"))
                    .join(uni.select(F.col("__w").alias("__w2k"),
                                     F.col("__c1").alias("__cw2")),
                          w2 == F.col("__w2k"))
                    .crossJoin(F.broadcast(n_total)))
    p = (F.lit(lam) * F.col("__c12").cast("double") / F.col("__cw1")
         + F.lit(1.0 - lam) * F.col("__cw2").cast("double") / F.col("__n"))
    q = F.floor(-F.log(p) * _SCALE + F.lit(0.5)).cast("long")
    gram_cost = scored_grams.select("__bg", q.alias("__q"))

    return (bi_occ.join(gram_cost, "__bg")
                  .groupBy(id_col)
                  .agg(F.count(F.lit(1)).cast("long").alias("n_bigrams"),
                       F.sum("__q").cast("long").alias("nll_micro")))


def dsir_importance(raw: DataFrame, target: DataFrame, text_col: str,
                    id_col: str, num_buckets: int = 10_000,
                    k: int | None = None) -> DataFrame:
    """DSIR hashed-n-gram importance weights of ``raw`` documents toward
    ``target``'s distribution (Xie et al. 2023 §3).

    Features are bigrams hashed into ``num_buckets`` buckets via md5
    (cross-engine deterministic, like every hash family in this repo).
    Bucket models use add-one smoothing: ``p(g) = (c_g + 1) /
    (N + num_buckets)``.  Weight = exact integer sum over the doc's gram
    occurrences of ``floor(ln(p_t/p_r)*1e6 + 0.5)``.

    Returns ``(id_col, n_grams, w_micro)`` — all raw docs with >= 1
    bigram, ordered by (w_micro desc, id asc), truncated to ``k`` when
    given.  ``w_micro`` stays an exact long: no float rounding anywhere
    in the output."""
    def grams(df):
        return df.select(
            F.col(id_col),
            F.explode(_bigrams_col(tokens_col(text_col))).alias("__bg"))

    bucket = (F.conv(F.substring(F.md5("__bg"), 1, 8), 16, 10)
               .cast("long") % num_buckets).alias("__b")

    raw_g = grams(raw).select(id_col, bucket)
    # <= num_buckets rows; materialized once (the emptiness guard below
    # forces it) so the model join doesn't re-run the target-corpus
    # explode-aggregate a second time
    tgt_counts = (grams(target).select(bucket)
                  .groupBy("__b").agg(F.count(F.lit(1)).alias("__ct"))
                  .localCheckpoint(eager=True))
    # a target with zero bigrams would make every model probability NULL
    # and silently return NULL weights — refuse loudly instead (the
    # count runs on the bucket-sized aggregate, not the corpus)
    if tgt_counts.limit(1).count() == 0:
        raise ValueError(
            "dsir_importance: target corpus has no bigrams "
            "(empty, or every doc under 2 tokens)")
    raw_counts = (raw_g.groupBy("__b")
                       .agg(F.count(F.lit(1)).alias("__cr")))
    nt = tgt_counts.agg(F.sum("__ct").cast("double").alias("__nt"))
    nr = raw_counts.agg(F.sum("__cr").cast("double").alias("__nr"))

    # both models are <= num_buckets rows — broadcast; the raw corpus
    # explode joins them without shuffling itself
    models = (raw_counts.join(tgt_counts, "__b", "left")
                        .crossJoin(nt).crossJoin(nr)
                        .select(
                            "__b",
                            ((F.coalesce("__ct", F.lit(0)) + 1)
                             / (F.col("__nt") + num_buckets)).alias("__pt"),
                            ((F.col("__cr") + 1)
                             / (F.col("__nr") + num_buckets)).alias("__pr")))
    q = F.floor(F.log(F.col("__pt") / F.col("__pr")) * _SCALE
                + F.lit(0.5)).cast("long")

    out = (raw_g.join(F.broadcast(models.withColumn("__q", q)
                                        .select("__b", "__q")), "__b")
                .groupBy(id_col)
                .agg(F.count(F.lit(1)).cast("long").alias("n_grams"),
                     F.sum("__q").cast("long").alias("w_micro"))
                .orderBy(F.col("w_micro").desc(), F.col(id_col).asc()))
    return out.limit(k) if k is not None else out
