"""Structured Streaming over events: windows, watermark, stateful op,
foreachBatch upsert sink. Each stream runs trigger(availableNow) to a
memory sink and is compared against the equivalent batch computation."""

import os
import uuid

import pytest
from pyspark.sql import functions as F

from pydata_vector_search_spark import streaming as S
from pydata_vector_search_spark.catalog import Catalog, read_table

EVENTS = "/root/testdata/sf0.001/events.parquet"


def _run_to_memory(df, name, mode="append", timeout=120):
    q = (df.writeStream.format("memory").queryName(name)
         .outputMode(mode)
         .option("checkpointLocation", f"/tmp/pvss_ckpt_{name}_{uuid.uuid4().hex}")
         .trigger(availableNow=True).start())
    q.awaitTermination(timeout)
    return q


def test_stream_matches_batch_schema(spark):
    # Same columns as the batch reader; `ts` alone differs by design:
    # watermarks require TIMESTAMP (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE on
    # NTZ), while batch keeps the file's native NTZ. Both expose the same
    # raw micros, read as UTC instants.
    from pyspark.sql.types import TimestampNTZType, TimestampType
    st = S.read_events_stream(spark, EVENTS)
    batch = read_table(spark, "/root/testdata/sf0.001", "events")
    assert st.isStreaming
    assert [f.name for f in st.schema] == [f.name for f in batch.schema]
    for sf, bf in zip(st.schema, batch.schema):
        if sf.name == "ts":
            assert isinstance(sf.dataType, TimestampType)
            assert isinstance(bf.dataType, (TimestampType, TimestampNTZType,
                                            type(sf.dataType)))
        else:
            assert sf.dataType == bf.dataType


def test_tumbling_window_agg_matches_batch(spark):
    st = S.tumbling_window_agg(S.read_events_stream(spark, EVENTS),
                               window="1 day", watermark="1 day")
    name = f"tumb_{uuid.uuid4().hex[:8]}"
    _run_to_memory(st, name, mode="append")
    got = {(r.win_start, r.event_type): (r.n_events, r.sum_value)
           for r in spark.table(name).collect()}

    ev = read_table(spark, "/root/testdata/sf0.001", "events")
    exp = {(r.win_start, r.event_type): (r.n_events, r.sum_value)
           for r in (ev.groupBy(F.window("ts", "1 day").alias("win"), "event_type")
                       .agg(F.count(F.lit(1)).alias("n_events"),
                            F.round(F.sum("value"), 2).alias("sum_value"))
                       .select(F.col("win.start").alias("win_start"),
                               "event_type", "n_events", "sum_value")
                       .collect())}
    # availableNow emits only windows closed by the final watermark; all
    # emitted windows must exactly match batch, and most windows must emit.
    assert got
    for k, v in got.items():
        assert exp[k] == v
    assert len(got) >= len(exp) - 2 * ev.select("event_type").distinct().count()


def test_sliding_window_overlap(spark):
    st = S.sliding_window_agg(S.read_events_stream(spark, EVENTS),
                              window="1 day", slide="6 hours")
    name = f"slide_{uuid.uuid4().hex[:8]}"
    _run_to_memory(st, name)
    rows = spark.table(name).collect()
    assert rows
    # every emitted window is day-long and 6h-aligned
    for r in rows:
        assert (r.win_end - r.win_start).total_seconds() == 86400
        assert r.win_start.hour % 6 == 0


def test_session_window_gap(spark):
    st = S.session_window_agg(S.read_events_stream(spark, EVENTS),
                              gap="30 minutes", watermark="1 day")
    name = f"sess_{uuid.uuid4().hex[:8]}"
    _run_to_memory(st, name)
    rows = spark.table(name).collect()
    assert rows
    assert all(r.sess_end > r.sess_start for r in rows)
    # one user's sessions never overlap
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append((r.sess_start, r.sess_end))
    for spans in by_user.values():
        spans.sort()
        for (s1, e1), (s2, _) in zip(spans, spans[1:]):
            assert s2 >= e1


def test_running_totals_stateful(spark):
    st = S.running_totals_stateful(S.read_events_stream(spark, EVENTS))
    name = f"stateful_{uuid.uuid4().hex[:8]}"
    _run_to_memory(st, name, mode="update")
    got = {r.event_type: (r.n_events, r.total_value)
           for r in spark.table(name).collect()}

    ev = read_table(spark, "/root/testdata/sf0.001", "events")
    exp = {r.event_type: (r.n, r.total) for r in
           ev.groupBy("event_type")
             .agg(F.count(F.lit(1)).alias("n"),
                  F.round(F.sum("value"), 2).alias("total")).collect()}
    # single availableNow batch → final state equals the batch totals
    assert got == exp


def test_dedup_stream_global_matches_batch_distinct(spark):
    dd = S.dedup_stream(S.read_events_stream(spark, EVENTS),
                        ["user_id", "event_type"])
    name = f"dedup_{uuid.uuid4().hex[:8]}"
    _run_to_memory(dd.select("user_id", "event_type"), name)
    got = {(r.user_id, r.event_type) for r in spark.table(name).collect()}
    ev = read_table(spark, "/root/testdata/sf0.001", "events")
    exp = {(r.user_id, r.event_type) for r in
           ev.select("user_id", "event_type").distinct().collect()}
    assert got == exp


def test_dedup_stream_within_watermark_bounded_state(spark):
    # the eviction variant still yields AT LEAST the distinct keys (a key
    # can be re-emitted after eviction, never lost) and runs with state
    # bounded by the watermark horizon
    dd = S.dedup_stream(S.read_events_stream(spark, EVENTS),
                        ["user_id", "event_type"], watermark="1 day",
                        within_watermark=True)
    name = f"dedupw_{uuid.uuid4().hex[:8]}"
    _run_to_memory(dd.select("user_id", "event_type"), name)
    got = [(r.user_id, r.event_type) for r in spark.table(name).collect()]
    ev = read_table(spark, "/root/testdata/sf0.001", "events")
    exp = {(r.user_id, r.event_type) for r in
           ev.select("user_id", "event_type").distinct().collect()}
    assert set(got) >= exp


def test_stream_upsert_sink_last_write_wins(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "cat"))
    st = S.read_events_stream(spark, EVENTS)
    # project to a keyed latest-value-per-user table
    latest = st.select("user_id", "ts", "event_type", "value")
    q = S.stream_upsert_sink(latest, cat, "user_latest", key="user_id",
                             order_by="ts",
                             checkpoint=str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    n_first = cat.load("user_latest").count()
    ev = read_table(spark, "/root/testdata/sf0.001", "events")
    assert n_first == ev.select("user_id").distinct().count()
    # second run with same data is idempotent on count
    q2 = S.stream_upsert_sink(
        S.read_events_stream(spark, EVENTS).select("user_id", "ts",
                                                   "event_type", "value"),
        cat, "user_latest", key="user_id", order_by="ts",
        checkpoint=str(tmp_path / "ckpt2"))
    q2.awaitTermination(120)
    assert cat.load("user_latest").count() == n_first


def test_await_stream_raises_on_timeout():
    """The memory-sink readback must never race a still-running query."""
    import pytest as _pytest
    from __spark_entry__ import _await_stream

    class _Stuck:
        name = "stuck"
        stopped = False
        def awaitTermination(self, timeout):
            return False
        def stop(self):
            self.stopped = True

    q = _Stuck()
    with _pytest.raises(TimeoutError, match="partially-filled"):
        _await_stream(q, timeout_sec=1)
    assert q.stopped


def test_stream_stream_join_exact_matches_batch(spark):
    """watermark=None mode: the streamed click->purchase interval join
    emits exactly the batch join's pair set."""
    ev = S.read_events_stream(spark, EVENTS)
    clicks = ev.filter(F.col("event_type") == "click") \
               .select("user_id", "ts", "event_id")
    purch = ev.filter(F.col("event_type") == "purchase") \
              .select("user_id", "ts", "event_id", "value")
    j = S.stream_stream_join(clicks, purch, on="user_id",
                             within="30 minutes", watermark=None)
    name = f"ssj_{uuid.uuid4().hex[:8]}"
    _run_to_memory(j.select("l_event_id", "r_event_id"), name)
    got = {(r.l_event_id, r.r_event_id) for r in spark.table(name).collect()}

    b = read_table(spark, os.path.dirname(EVENTS), "events")
    bc = b.filter("event_type = 'click'").select(
        F.col("user_id"), F.col("ts").alias("cts"),
        F.col("event_id").alias("cid"))
    bp = b.filter("event_type = 'purchase'").select(
        F.col("user_id"), F.col("ts").alias("pts"),
        F.col("event_id").alias("pid"))
    batch = bc.join(bp, "user_id").filter(
        (F.col("pts") >= F.col("cts"))
        & (F.col("pts") <= F.col("cts") + F.expr("INTERVAL 30 minutes")))
    want = {(r.cid, r.pid) for r in batch.collect()}
    assert got == want and len(want) > 0


def test_stream_stream_join_watermarked_bounded_state(spark):
    """Bounded-state mode: with both watermarks + the interval condition,
    state eviction may drop late cross-batch matches, but every emitted
    pair must still be a true batch-join pair (no false positives), and a
    single-batch availableNow run emits the full set."""
    ev = S.read_events_stream(spark, EVENTS)
    clicks = ev.filter(F.col("event_type") == "click") \
               .select("user_id", "ts", "event_id")
    purch = ev.filter(F.col("event_type") == "purchase") \
              .select("user_id", "ts", "event_id", "value")
    j = S.stream_stream_join(clicks, purch, on="user_id",
                             within="30 minutes", watermark="1 day")
    name = f"ssjw_{uuid.uuid4().hex[:8]}"
    _run_to_memory(j.select("l_event_id", "r_event_id"), name)
    got = {(r.l_event_id, r.r_event_id) for r in spark.table(name).collect()}

    b = read_table(spark, os.path.dirname(EVENTS), "events")
    bc = b.filter("event_type = 'click'").select(
        "user_id", F.col("ts").alias("cts"), F.col("event_id").alias("cid"))
    bp = b.filter("event_type = 'purchase'").select(
        "user_id", F.col("ts").alias("pts"), F.col("event_id").alias("pid"))
    want = {(r.cid, r.pid) for r in
            bc.join(bp, "user_id").filter(
                (F.col("pts") >= F.col("cts"))
                & (F.col("pts") <= F.col("cts")
                   + F.expr("INTERVAL 30 minutes"))).collect()}
    assert got <= want
    assert got == want      # single availableNow batch: nothing evicted early
