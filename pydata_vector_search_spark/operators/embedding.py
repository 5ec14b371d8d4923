"""Executor-side embedding pipeline (reference V5, re-architected).

The reference encodes on the DRIVER with sentence-transformers
(demo.ipynb c7:1-5: 92 batches of 32, single process) — the single worst
scale decision in the demo. Here encoding is a ``mapInPandas`` stage: each
executor task pulls Arrow batches of text, encodes locally, and emits the
embedding column alongside every input column. At 100 TB the encode cost
scales with executors and the data never funnels through the driver.

Encoders are pluggable via a tiny protocol; the default is a deterministic
hash encoder (test fixture parity — FIXTURES.md requires embedding fixtures
never depend on a real model), and a sentence-transformers adapter is gated
behind an import-try since torch isn't in this container.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import ArrayType, FloatType, StructField, StructType


class HashEncoder:
    """Deterministic, dependency-free encoder: each token maps to a pseudo-
    random (md5-seeded) Gaussian direction; a document embeds as the
    L2-normalized sum of its token vectors. Same text → same vector in any
    process on any machine — the property the correctness harness needs."""

    def __init__(self, dim: int = 64):
        self.dim = dim

    def _token_vec(self, token: str) -> np.ndarray:
        seed = int.from_bytes(hashlib.md5(token.encode()).digest()[:8], "big")
        return np.random.default_rng(seed).standard_normal(self.dim)

    def encode_batch(self, texts: list[str]) -> np.ndarray:
        out = np.zeros((len(texts), self.dim))
        for i, t in enumerate(texts):
            toks = (t or "").lower().split()
            if toks:
                out[i] = np.sum([self._token_vec(w) for w in toks], axis=0)
            n = np.linalg.norm(out[i])
            if n > 0:
                out[i] /= n
        return out.astype(np.float32)


class Md5Encoder:
    """SQL-reproducible encoder: component j of a token is
    ``int(md5(tok + ':' + j)[:8], 16) / 2³² − 0.5``; a document embeds as
    the L2-normalized sum of its token vectors. Unlike ``HashEncoder``
    (seeded Gaussians — numpy-only), every arithmetic step here exists in
    any engine with md5, so the executor-side mapInPandas pipeline can be
    hash-checked against a DuckDB oracle end-to-end."""

    def __init__(self, dim: int = 8):
        self.dim = dim

    def encode_batch(self, texts: list[str]) -> np.ndarray:
        out = np.zeros((len(texts), self.dim))
        for i, t in enumerate(texts):
            for tok in (t or "").lower().split():
                for j in range(self.dim):
                    h = hashlib.md5(f"{tok}:{j}".encode()).hexdigest()[:8]
                    out[i, j] += int(h, 16) / 2**32 - 0.5
            n = np.linalg.norm(out[i])
            if n > 0:
                out[i] /= n
        return out.astype(np.float64)


class SentenceTransformerEncoder:
    """Adapter for the reference's model (all-MiniLM-L6-v2, demo.ipynb
    c1:11). Import-gated: raises at construction if the library is absent."""

    def __init__(self, model_name: str = "all-MiniLM-L6-v2"):
        try:
            from sentence_transformers import SentenceTransformer
        except ImportError as e:  # pragma: no cover - not in container
            raise ImportError(
                "sentence-transformers not installed; use HashEncoder or "
                "install the extra") from e
        self._model = SentenceTransformer(model_name)
        self.dim = self._model.get_sentence_embedding_dimension()

    def encode_batch(self, texts: list[str]) -> np.ndarray:  # pragma: no cover
        return np.asarray(self._model.encode(texts))


def embed_text(df: DataFrame, text_col: str, out_col: str = "embedding",
               encoder=None, batch_size: int = 256) -> DataFrame:
    """Append an ``array<float>`` embedding column, executor-side.

    mapInPandas (not a scalar pandas_udf) so the encoder can batch on its
    own terms and amortize model init per task rather than per row.

    Real-model (GPU) tuning: ``batch_size`` governs the encoder call
    (model throughput knob); the SEPARATE Arrow transfer knob is
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` (default 10k) — at
    dim=384 float32 (MiniLM) a 10k-row Arrow batch is ~15 MB of
    embeddings, fine; for dim≥1536 drop it to 2-4k so the Python worker
    isn't holding multi-batch × multi-MB buffers. One GPU per executor:
    cap ``spark.task.cpus`` / use barrier-less repartition so concurrent
    tasks don't contend for the device; model weights load once per task
    (the ``enc`` capture below), so prefer FEWER, LARGER partitions for
    encode stages — the opposite of the CPU-scan default."""
    encoder = encoder or HashEncoder()
    schema = StructType(df.schema.fields
                        + [StructField(out_col, ArrayType(FloatType()), True)])
    cols = df.columns

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        enc = encoder  # captured once per task
        for pdf in batches:
            for start in range(0, len(pdf), batch_size):
                chunk = pdf.iloc[start:start + batch_size].copy()
                vecs = enc.encode_batch(chunk[text_col].fillna("").tolist())
                chunk[out_col] = [v.tolist() for v in vecs]
                yield chunk

    return df.mapInPandas(encode, schema=schema)


def with_source_text(df: DataFrame, cols: list[str],
                     out_col: str = "text_for_vector") -> DataFrame:
    """Reference V6: text_for_vector = title + ' ' + description
    (demo.ipynb c5:10) as concat_ws."""
    return df.withColumn(out_col, F.concat_ws(" ", *cols))


def embed_text_mllib(df: DataFrame, text_col: str,
                     out_col: str = "embedding", dim: int = 64,
                     min_doc_freq: int = 0) -> DataFrame:
    """Built-in distributed embedding via MLlib HashingTF → IDF (the
    BASELINE.json "MLlib for batch embedding" path; SURVEY §2.2 V5
    fallback): term-hash counts at ``dim`` features, IDF-weighted, emitted
    as plain ``array<float>`` so every downstream vector operator (KNN,
    IVF, near-dup) runs on it unchanged. Entirely JVM-side — no Python in
    the pipeline; the IDF fit is one distributed pass."""
    from pyspark.ml.feature import IDF, HashingTF, Tokenizer
    from pyspark.ml.functions import vector_to_array

    tok = Tokenizer(inputCol=text_col, outputCol="__words")
    tf = HashingTF(inputCol="__words", outputCol="__tf", numFeatures=dim)
    stage = tf.transform(tok.transform(df))
    idf = IDF(inputCol="__tf", outputCol="__idf",
              minDocFreq=min_doc_freq).fit(stage)
    return (idf.transform(stage)
               .withColumn(out_col,
                           vector_to_array("__idf").cast("array<float>"))
               .drop("__words", "__tf", "__idf"))
