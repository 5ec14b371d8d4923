"""Multi-micro-batch watermark semantics: progression across batches and
late-data drop — the state-eviction behavior that bounds memory at scale."""

import datetime as dt
import uuid

import pytest
from pyspark.sql import functions as F

from pydata_vector_search_spark import streaming as S


_MTIME = [1_700_000_000]


def _write_batch(spark, path, rows):
    import glob
    import os
    before = set(glob.glob(f"{path}/*.parquet"))
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string") \
        .coalesce(1).write.mode("append").parquet(path)
    # the file source orders batches by modification time; make the write
    # order unambiguous (same-second mtimes tie-break by random part name)
    _MTIME[0] += 60
    for f in set(glob.glob(f"{path}/*.parquet")) - before:
        os.utime(f, (_MTIME[0], _MTIME[0]))


def _ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


def _run(spark, src, name):
    # read with the batch-parquet schema (these fixtures store real
    # timestamps, not nanos-as-long)
    st = (spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string")
          .option("maxFilesPerTrigger", 1).parquet(src))
    agg = S.tumbling_window_agg(st, window="1 hour", watermark="30 minutes")
    q = (agg.writeStream.format("memory").queryName(name)
         .outputMode("append")
         .option("checkpointLocation", f"/tmp/pvss_wm_{name}_{uuid.uuid4().hex}")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    return {(r.win_start, r.event_type): r.n_events
            for r in spark.table(name).collect()}


def test_watermark_advances_across_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    # batch 1: hours 1,2 — batch 2: hour 5 (watermark jumps to 4:30)
    _write_batch(spark, src, [(1, _ts(1, 10), 1, "a", 1.0, "{}"),
                              (2, _ts(2, 10), 1, "a", 1.0, "{}")])
    _write_batch(spark, src, [(3, _ts(5, 10), 1, "a", 1.0, "{}")])
    got = _run(spark, src, f"wm_{uuid.uuid4().hex[:8]}")
    starts = sorted(k[0].hour for k in got)
    # windows 1:00 and 2:00 closed (end <= 4:40 watermark); 5:00 not closed
    assert starts == [1, 2]
    assert all(v == 1 for v in got.values())


def test_late_rows_beyond_watermark_dropped(spark, tmp_path):
    """Late-record filtering lags the watermark by ONE batch (Spark 3.4+
    splits watermarkForLateEvents = previous batch's watermark from
    watermarkForEviction = current). A late row must therefore arrive ≥2
    batches after the watermark-advancing batch to be guaranteed-dropped —
    exactly what this pins down."""
    src = str(tmp_path / "src")
    # batch 1 pushes event time to hour 6 → watermark 5:30+ after batch 1
    _write_batch(spark, src, [(1, _ts(6), 1, "a", 1.0, "{}"),
                              (2, _ts(6, 5), 1, "b", 1.0, "{}")])
    # batch 2: on-time filler (late filter still at the pre-batch-1 value)
    _write_batch(spark, src, [(3, _ts(6, 20), 1, "a", 1.0, "{}")])
    # batch 3 delivers a row in hour 2, far below the 5:35 late-event
    # watermark now in force → MUST be dropped
    _write_batch(spark, src, [(4, _ts(2), 1, "a", 99.0, "{}")])
    got = _run(spark, src, f"wm_{uuid.uuid4().hex[:8]}")
    assert all(k[0].hour != 2 for k in got), f"late row leaked: {got}"


def test_no_late_data_matches_single_batch(spark, tmp_path):
    rows = [(i, _ts(1 + i // 4, (i % 4) * 10), i % 3, "t", 1.0, "{}")
            for i in range(12)]
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    _write_batch(spark, a, rows)                      # one file
    for i in range(0, 12, 4):                          # three in-order files
        _write_batch(spark, b, rows[i:i + 4])
    single = _run(spark, a, f"wm_{uuid.uuid4().hex[:8]}")
    multi = _run(spark, b, f"wm_{uuid.uuid4().hex[:8]}")
    assert single == multi
