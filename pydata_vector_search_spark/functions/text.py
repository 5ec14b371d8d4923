"""Text-analysis expressions for LLM-data-pipeline operators.

All pure Catalyst column expressions (no Python UDFs): token counting,
normalization, fingerprinting, quality scoring, and a heuristic language-ID.
Each declared query built on these has a DuckDB-oracle twin (see
``__spark_entry__.oracle_sql``), so every rule here is deliberately
expressible in ANSI-ish SQL on both engines.

These extend the reference's surface (it has no text ops beyond string concat,
demo.ipynb c5:10) per the driver mandate: dedup / text analysis as first-class
components for a 100 TB training-data pipeline. At scale: every expression is
per-row (no shuffle), runs in whole-stage codegen over the columnar scan.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def _c(x: Column | str) -> Column:
    return F.col(x) if isinstance(x, str) else x


def normalized_text(text: Column | str) -> Column:
    """Lowercase, collapse whitespace runs, trim — canonical form for
    exact-dup fingerprinting."""
    return F.trim(F.regexp_replace(F.lower(_c(text)), r"\s+", " "))


def token_count(text: Column | str) -> Column:
    """Whitespace token count (empty string → 0)."""
    t = F.trim(_c(text))
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+")))


# GPT-2-style pre-tokenizer, simplified to constructs Java regex and RE2
# (DuckDB) evaluate identically: letter runs, single digits, single
# non-alphanumeric symbols. Approximates BPE token counts (every BPE token
# boundary is a subset of these splits) without a vocab file.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


def token_count_bpe(text: Column | str) -> Column:
    """BPE-ish token count: matches of ``BPE_ISH_PATTERN`` (driver mandate:
    'token counting (whitespace + a BPE-ish regex)'). JVM-side
    regexp_extract_all — no UDF."""
    return F.size(F.regexp_extract_all(_c(text), F.lit(BPE_ISH_PATTERN), 0))


def fingerprint_md5(text: Column | str) -> Column:
    """Document fingerprint = md5 of the normalized text (cross-engine
    stable; DuckDB md5() produces the same hex)."""
    return F.md5(normalized_text(text))


def rolling_hash(text: Column | str, base: int = 31,
                 mod: int = 2_147_483_647) -> Column:
    """Polynomial rolling hash over UTF-8 code points, left-to-right fold.

    Engine-internal fingerprint variant (content-defined chunking seeds,
    shingle pre-hash). Deterministic; unit-tested against a pure-Python
    reference rather than the SQL oracle.
    """
    chars = F.split(_c(text), "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * base + F.ascii(ch)) % mod,
    )


def punct_ratio(text: Column | str) -> Column:
    t = _c(text)
    n = F.length(t)
    punct = F.length(F.regexp_replace(t, r"[^.,;:!?'\"()\[\]{}-]", ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(punct.cast("double") / n)


_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")


def stopword_ratio(text: Column | str) -> Column:
    """Fraction of whitespace tokens that are common English stopwords."""
    t = normalized_text(text)
    toks = F.split(t, " ")
    stops = F.filter(toks, lambda w: w.isin(*_STOPWORDS))
    return F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(
        F.size(stops).cast("double") / F.size(toks))


def quality_score(text: Column | str) -> Column:
    """Heuristic doc-quality score in [0, 1]: rewards mid-length docs and a
    healthy mix of word lengths; penalizes punctuation soup. Deterministic
    arithmetic only — the DuckDB oracle reproduces it exactly (after
    round(2))."""
    t = _c(text)
    n_chars = F.length(t).cast("double")
    n_tok = token_count(t).cast("double")
    avg_word = F.when(n_tok == 0, F.lit(0.0)).otherwise(n_chars / n_tok)
    len_term = F.least(n_chars / F.lit(200.0), F.lit(1.0))          # length credit, saturates at 200 chars
    word_term = F.when((avg_word >= 3) & (avg_word <= 12), F.lit(1.0)).otherwise(F.lit(0.5))
    punct_term = F.lit(1.0) - F.least(punct_ratio(t) * 5, F.lit(1.0))
    return (F.lit(0.4) * len_term + F.lit(0.3) * word_term
            + F.lit(0.3) * punct_term)


def dup_token_fraction(text: Column | str) -> Column:
    """Gopher-style repetition signal (Rae et al. 2021 §A1.1 "repetition"
    filters, public): fraction of tokens that are repeats of an earlier
    token — ``1 − distinct/total`` over whitespace tokens. 0 = no
    repetition; high values mark boilerplate/spam. Pure Catalyst array
    arithmetic; empty docs score 0."""
    toks = F.split(normalized_text(text), " ")
    n = F.size(toks).cast("double")
    return F.when(n <= 0, F.lit(0.0)).otherwise(
        F.lit(1.0) - F.size(F.array_distinct(toks)) / n)


def dup_bigram_fraction(text: Column | str) -> Column:
    """Companion repetition signal over word 2-grams (catches looped
    phrases that distinct-token counting misses). ``1 − distinct/total``
    over consecutive token pairs; docs with < 2 tokens score 0. Same
    O(tokens) zipped-slices construction as the shingler — no quadratic
    slicing, no UDF."""
    toks = F.split(normalized_text(text), " ")
    m = F.size(toks) - 1                       # number of bigrams
    a = F.slice(toks, 1, m)
    b = F.slice(toks, 2, m)
    grams = F.zip_with(a, b, lambda x, y: F.concat(x, F.lit(" "), y))
    return F.when(m <= 0, F.lit(0.0)).otherwise(
        F.lit(1.0) - F.size(F.array_distinct(grams)) / m.cast("double"))


# charset checks + distinctive stopwords per language; ties resolve by the
# fixed priority order en > es > fr > de (both engines apply the same CASE).
_LANG_MARKERS = {
    "en": ("the", "and", "of"),
    "es": ("el", "los", "las"),
    "fr": ("le", "les", "et"),
    "de": ("der", "und", "die"),
}


def _marker_hits(text_norm: Column, words: tuple[str, ...]) -> Column:
    toks = F.split(text_norm, " ")
    return F.size(F.filter(toks, lambda w: w.isin(*words)))


def lang_id(text: Column | str) -> Column:
    """Heuristic language ID: CJK charset → zh, Cyrillic → ru, else the
    Latin language whose marker stopwords appear most (priority order on
    ties), else 'und'."""
    t = _c(text)
    norm = normalized_text(t)
    hits = {k: _marker_hits(norm, v) for k, v in _LANG_MARKERS.items()}
    best = F.greatest(*hits.values())
    latin = (F.when(best == 0, F.lit("und"))
              .when(hits["en"] == best, F.lit("en"))
              .when(hits["es"] == best, F.lit("es"))
              .when(hits["fr"] == best, F.lit("fr"))
              .otherwise(F.lit("de")))
    return (F.when(t.rlike(r"[一-鿿]"), F.lit("zh"))
             .when(t.rlike(r"[Ѐ-ӿ]"), F.lit("ru"))
             .otherwise(latin))


# --------------------------------------------------------------------------
# PII redaction
# --------------------------------------------------------------------------

# Patterns deliberately restricted to the regex dialect intersection of
# Java (Spark codegen) and RE2 (DuckDB): no backrefs, no lookaround, \b ok.
_PII_PATTERNS = (
    # email before phone: the local part may contain digits a phone
    # pattern would otherwise nibble at
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    # IPv4 before phone: dotted quads are digit runs too
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d[\d\- ]{7,}\d", "<PHONE>"),
)


def redact_pii(text: Column | str,
               kinds: tuple[str, ...] = ("email", "ip", "phone")) -> Column:
    """Scrub common PII shapes from training text — the redaction gate a
    corpus pipeline runs before anything leaves the trust boundary.
    Replaces emails / IPv4s / phone-like digit runs with typed tokens
    (``<EMAIL>``/``<IP>``/``<PHONE>``) so downstream token statistics
    stay meaningful. Pure Catalyst ``regexp_replace`` chain — codegen'd,
    no UDF, and the patterns are dialect-portable (Java + RE2) so the
    DuckDB oracle replays them verbatim. Application order is fixed
    (email, ip, phone): earlier rewrites must not expose digit runs the
    later patterns would misread.

    This is pattern-shape redaction, not NER: names/addresses need a
    model and are out of scope (the same boundary Presidio draws between
    its regex and NLP recognizers)."""
    out = _c(text)
    for kind, pat, repl in _PII_PATTERNS:
        if kind in kinds:
            out = F.regexp_replace(out, pat, repl)
    return out
