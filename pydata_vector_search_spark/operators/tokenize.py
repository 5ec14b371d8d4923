"""Pluggable executor-side tokenization (VERDICT r07 #5).

Budget selection (``select_token_budget``), packing (``pack_sequences``)
and mixing (``temperature_mix(weight_col=)``) all consume an externally
supplied token-count column — real pretraining recipes specify BPE
tokens, not whitespace words. This module is the documented hook that
produces that column at scale: an Arrow-batched ``mapInPandas`` stage
(the same executor-side discipline as ``operators/embedding.py`` — the
tokenizer loads once per task, text never funnels through the driver),
with a deterministic dependency-free fallback and an import-gated
adapter for real BPE vocabularies (HuggingFace ``tokenizers`` /
``tiktoken`` are not in this container — same gating pattern as
``SentenceTransformerEncoder``).

Tokenizer protocol: ``count_batch(texts: list[str]) -> list[int]``.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import LongType, StructField, StructType

from pydata_vector_search_spark.functions.text import BPE_ISH_PATTERN


class RegexBpeTokenizer:
    """Deterministic fallback: counts matches of ``BPE_ISH_PATTERN`` —
    bit-identical to the JVM-side ``functions.text.token_count_bpe``
    Column (equality-pinned in tests), so pipelines built on the hook
    reproduce exactly when the real tokenizer is swapped out."""

    def __init__(self, pattern: str = BPE_ISH_PATTERN):
        self._pat = re.compile(pattern)

    def count_batch(self, texts: list[str]) -> list[int]:
        return [len(self._pat.findall(t or "")) for t in texts]


class HuggingFaceTokenizer:
    """Adapter for a real BPE vocabulary via the HuggingFace
    ``tokenizers`` runtime. Import-gated: raises at construction if the
    library is absent (not in this container — the one-step close-out
    is ``pip install tokenizers`` plus a local ``tokenizer.json``)."""

    def __init__(self, tokenizer_file: str):
        try:
            from tokenizers import Tokenizer
        except ImportError as e:  # pragma: no cover - not in container
            raise ImportError(
                "the 'tokenizers' package is not installed; use "
                "RegexBpeTokenizer or install the extra") from e
        self._tok = Tokenizer.from_file(tokenizer_file)

    def count_batch(self, texts: list[str]) -> list[int]:  # pragma: no cover
        return [len(e.ids)
                for e in self._tok.encode_batch([t or "" for t in texts])]


def tokenize_counts(df: DataFrame, text_col: str,
                    out_col: str = "n_tok", tokenizer=None,
                    batch_size: int = 1024) -> DataFrame:
    """Append a LONG token-count column computed by ``tokenizer`` on the
    executors (Arrow batches; tokenizer constructed/captured once per
    task). Default tokenizer is ``RegexBpeTokenizer``.

    Feed the result straight into the budget/packing/mixing operators:
    ``pack_sequences(tokenize_counts(df, "text"), id, "n_tok", ...)`` —
    the epoch composition runs on real tokenizer counts by swapping one
    constructor. At 100 TB the count is one embarrassingly parallel
    scan; prefer this hook over per-row UDFs (vocab load amortizes per
    task, batches transfer as Arrow)."""
    tokenizer = tokenizer or RegexBpeTokenizer()
    schema = StructType(df.schema.fields
                        + [StructField(out_col, LongType(), True)])

    def count(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tok = tokenizer  # captured once per task
        for pdf in batches:
            for start in range(0, len(pdf), batch_size):
                chunk = pdf.iloc[start:start + batch_size].copy()
                chunk[out_col] = pd.Series(
                    tok.count_batch(chunk[text_col].fillna("").tolist()),
                    index=chunk.index, dtype="int64")
                yield chunk

    return df.mapInPandas(count, schema=schema)
