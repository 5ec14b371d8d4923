"""Multimodal column plumbing: binary payloads, struct metadata via
mapInPandas, frame fan-out, feature vectors feeding KNN."""

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from pydata_vector_search_spark.catalog import read_table
from pydata_vector_search_spark.operators import knn, multimodal as M


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents").limit(40)
    return M.attach_fake_media(docs, "text")


def test_attach_media_is_binary(media):
    assert dict(media.dtypes)["media"] == "binary"


def test_image_meta_matches_python(media):
    got = M.decode_image_meta(media).select("doc_id", "text", "image_meta").collect()
    assert got
    for r in got:
        fmt, w, h, c, n = M.fake_image_meta(r.text.encode("utf-8"))
        assert (r.image_meta.format, r.image_meta.width, r.image_meta.height,
                r.image_meta.channels, r.image_meta.n_bytes) == (fmt, w, h, c, n)
        assert 16 <= r.image_meta.width < 16 + 2048
        assert 1 <= r.image_meta.channels <= 4


def test_audio_meta_schema(media):
    row = M.decode_audio_meta(media).select("audio_meta").head()
    assert row.audio_meta.codec in ("pcm", "opus", "flac")
    assert row.audio_meta.sample_rate in (8000, 16000, 44100, 48000)


def test_real_decode_raises_stub(media):
    with pytest.raises(NotImplementedError, match="STUB"):
        M.decode_image_meta(media, real=True).collect()
    with pytest.raises(NotImplementedError, match="STUB"):
        M.decode_audio_meta(media, real=True).collect()


def test_sample_frames_fan_out(media):
    n_in = media.count()
    frames = M.sample_frames(media, n_frames=4)
    assert frames.count() == 4 * n_in
    r = frames.select("doc_id", "frame_idx", "frame").filter("frame_idx = 1").head()
    assert isinstance(r.frame, (bytes, bytearray)) and len(r.frame) >= 1
    # frames partition the payload deterministically
    per_doc = (frames.groupBy("doc_id")
               .agg(F.countDistinct("frame_idx").alias("n")).collect())
    assert all(x.n == 4 for x in per_doc)


def test_media_features_feed_knn(spark, media):
    feat = M.media_features(media, dim=32)
    row = feat.select("features").head()
    v = np.array(row.features)
    assert v.shape == (32,)
    assert abs(np.linalg.norm(v) - 1.0) < 1e-3
    # features are a first-class embedding column: exact KNN runs on them
    qv = [float(x) for x in row.features]
    hits = knn.vector_search(feat, "features", qv, k=3,
                             tiebreaker="doc_id").collect()
    assert len(hits) == 3
    assert hits[0]._distance == pytest.approx(0.0, abs=1e-5)


def test_features_deterministic(media):
    a = M.media_features(media, dim=16).select("doc_id", "features").collect()
    b = M.media_features(media, dim=16).select("doc_id", "features").collect()
    assert {r.doc_id: tuple(r.features) for r in a} \
        == {r.doc_id: tuple(r.features) for r in b}


def test_binary_file_source(spark, sf_dir):
    df = M.read_binary_files(spark, f"{sf_dir}/documents.parquet")
    r = df.select("path", "length", "content").head()
    assert r.length == len(r.content)


def test_segment_audio_windows_from_metadata(spark):
    from pydata_vector_search_spark.operators import multimodal as M
    df = spark.createDataFrame([(1, "short clip"), (2, "x" * 500)],
                               "doc_id int, text string")
    segs = (M.segment_audio(M.decode_audio_meta(M.attach_fake_media(df, "text")),
                            window_ms=10_000)
            .select("doc_id", "seg_idx", "seg_start_ms", "seg_end_ms",
                    "audio_meta.duration_ms").collect())
    by_doc = {}
    for r in segs:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc, rows in by_doc.items():
        rows.sort(key=lambda r: r.seg_idx)
        dur = rows[0].duration_ms
        assert len(rows) == max(-(-dur // 10_000), 1)
        assert rows[0].seg_start_ms == 0
        assert rows[-1].seg_end_ms == dur
        for a, b in zip(rows, rows[1:]):
            assert b.seg_start_ms == a.seg_end_ms == a.seg_start_ms + 10_000
