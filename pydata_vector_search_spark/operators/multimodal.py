"""Multimodal (image/audio/video) column operators (driver mandate).

The reference is text-only; these are the large-training-pipeline operators
BASELINE.json mandates. Convention: media is an opaque ``binary`` column
plus a typed metadata struct, carried through all relational ops like any
other column (columnar parquet stores the blob once; column pruning skips
it unless selected — at 100 TB that pruning IS the feature).

The Spark-side plumbing is real and tested: ``binaryFile`` source,
Arrow-batched ``mapInPandas`` with explicit schemas, nested struct output,
1→N row fan-out for frame sampling, and hash-based feature vectors that
feed straight into the engine's KNN/ANN operators. The pixel/sample DECODE
step is a STUB (image/audio libs are not in this container): by default a
deterministic fake decode — a pure function of the payload bytes (md5 +
length), reproducible in SQL so even the fake pipeline is oracle-checked —
and ``real=True`` raises ``NotImplementedError`` unless PIL is installed.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (ArrayType, BinaryType, FloatType, IntegerType,
                               LongType, StringType, StructField, StructType)

_FORMATS = ["jpeg", "png", "webp", "gif"]

IMAGE_META = StructType([
    StructField("format", StringType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("channels", IntegerType()),
    StructField("n_bytes", LongType()),
])

AUDIO_META = StructType([
    StructField("codec", StringType()),
    StructField("sample_rate", IntegerType()),
    StructField("duration_ms", LongType()),
    StructField("n_bytes", LongType()),
])


def read_binary_files(spark: SparkSession, path_glob: str) -> DataFrame:
    """Real media ingest: Spark's ``binaryFile`` source → (path,
    modificationTime, length, content binary). This is the production
    entry point; ``attach_fake_media`` exists only so the fixture tables
    (text-only) can exercise the same downstream plumbing."""
    return spark.read.format("binaryFile").load(path_glob)


def attach_fake_media(df: DataFrame, text_col: str,
                      media_col: str = "media") -> DataFrame:
    """Deterministic opaque payload (UTF-8 bytes of ``text_col``)."""
    return df.withColumn(media_col, F.encode(F.col(text_col), "UTF-8"))


# -- deterministic fake decode (md5-derived; SQL-reproducible) -------------

def fake_image_meta(payload: bytes) -> tuple:
    h = hashlib.md5(payload).hexdigest()
    return (_FORMATS[int(h[0], 16) % 4],
            16 + int(h[1:5], 16) % 2048,
            16 + int(h[5:9], 16) % 2048,
            1 + int(h[9], 16) % 4,
            len(payload))


def fake_audio_meta(payload: bytes) -> tuple:
    h = hashlib.md5(payload).hexdigest()
    return (["pcm", "opus", "flac"][int(h[0], 16) % 3],
            [8000, 16000, 44100, 48000][int(h[1], 16) % 4],
            50 + int(h[2:8], 16) % 600000,
            len(payload))


def decode_image_meta(df: DataFrame, media_col: str = "media",
                      meta_col: str = "image_meta",
                      real: bool = False) -> DataFrame:
    """Attach the typed image-metadata struct via Arrow-batched
    ``mapInPandas`` (executor-side, embarrassingly parallel, no shuffle)."""
    if real:
        try:
            from PIL import Image  # noqa: F401
        except ImportError as e:  # pragma: no cover
            raise NotImplementedError(
                "STUB: real image decode needs pillow, which is not in this "
                "container; the deterministic fake decode (real=False) "
                "exercises identical Spark plumbing") from e

    out_schema = StructType(df.schema.fields + [StructField(meta_col, IMAGE_META)])

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf[meta_col] = [
                dict(zip([f.name for f in IMAGE_META.fields],
                         fake_image_meta(bytes(p))))
                for p in pdf[media_col]]
            yield pdf

    return df.mapInPandas(fn, out_schema)


def decode_audio_meta(df: DataFrame, media_col: str = "media",
                      meta_col: str = "audio_meta",
                      real: bool = False) -> DataFrame:
    if real:
        raise NotImplementedError(
            "STUB: real audio decode needs an audio lib not in this container")

    out_schema = StructType(df.schema.fields + [StructField(meta_col, AUDIO_META)])

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf[meta_col] = [
                dict(zip([f.name for f in AUDIO_META.fields],
                         fake_audio_meta(bytes(p))))
                for p in pdf[media_col]]
            yield pdf

    return df.mapInPandas(fn, out_schema)


def segment_audio(df: DataFrame, meta_col: str = "audio_meta",
                  window_ms: int = 10_000,
                  idx_col: str = "seg_idx") -> DataFrame:
    """Audio windowing 1→N fan-out from the TYPED METADATA alone — pure
    Catalyst (sequence + explode), no UDF, no payload decode: each clip
    yields ``ceil(duration/window)`` segment rows with [start, end) in
    ms. This is the segmentation shape an ASR/embedding pipeline feeds
    (decode happens later, per segment, only for segments that survive
    filtering — at 100 TB pruning segments BEFORE decoding is the win).
    A real sample-accurate splitter would replace the byte-range math
    exactly like sample_frames' stub."""
    dur = F.col(f"{meta_col}.duration_ms")
    n = F.greatest(F.ceil(dur / window_ms).cast("int"), F.lit(1))
    out = df.withColumn(idx_col, F.explode(F.sequence(F.lit(0), n - 1)))
    start = (F.col(idx_col).cast("long") * window_ms)
    return (out.withColumn("seg_start_ms", start)
               .withColumn("seg_end_ms", F.least(start + window_ms, dur)))


def media_features(df: DataFrame, media_col: str = "media",
                   feature_col: str = "features", dim: int = 64) -> DataFrame:
    """Deterministic unit-norm feature vector per payload (md5-chained) —
    the stand-in for a real image/audio encoder. Output is plain
    ``array<float>``, so it feeds the engine's KNN/ANN/near-dup operators
    directly (the multimodal → embedding → similarity pipeline)."""
    out_schema = StructType(df.schema.fields
                            + [StructField(feature_col, ArrayType(FloatType()))])

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for p in pdf[media_col]:
                raw = np.frombuffer(
                    b"".join(hashlib.md5(bytes(p) + bytes([i])).digest()
                             for i in range((dim * 4 + 15) // 16)),
                    dtype="<u4")[:dim].astype(np.float64)
                v = raw / 2**32 - 0.5
                feats.append((v / np.linalg.norm(v)).astype(np.float32))
            pdf[feature_col] = feats
            yield pdf

    return df.mapInPandas(fn, out_schema)


def sample_frames(df: DataFrame, media_col: str = "media",
                  n_frames: int = 4, frame_col: str = "frame",
                  idx_col: str = "frame_idx") -> DataFrame:
    """Video-style 1→N fan-out: each payload yields ``n_frames`` rows with
    (frame_idx, frame-bytes slice). Real frame extraction is the STUB part;
    the fan-out plumbing (mapInPandas emitting more rows than it receives,
    stable schema) is the part a real decoder would drop into."""
    out_schema = StructType(df.schema.fields
                            + [StructField(idx_col, IntegerType()),
                               StructField(frame_col, BinaryType())])

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            reps = pdf.loc[pdf.index.repeat(n_frames)].reset_index(drop=True)
            idx = np.tile(np.arange(n_frames, dtype=np.int32), len(pdf))
            reps[idx_col] = idx
            frames = []
            for p, i in zip(reps[media_col], reps[idx_col]):
                b = bytes(p)
                step = max(1, len(b) // n_frames)
                frames.append(b[i * step:(i + 1) * step] or b[:1])
            reps[frame_col] = frames
            yield reps

    return df.mapInPandas(fn, out_schema)
