"""Batch sessionization edge cases (the declared `sessionize` query uses
the same lag + running-sum construction over the events fixture)."""

import datetime as dt

from pyspark.sql import Window, functions as F


def _sessions(spark, rows):
    """rows: (user_id, epoch_sec). Returns {user_id: n_sessions} via the
    same construction as q_sessionize."""
    ev = spark.createDataFrame(
        [(u, i, dt.datetime.utcfromtimestamp(t)) for i, (u, t) in
         enumerate(rows)],
        "user_id long, event_id long, ts timestamp")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tsec = F.unix_timestamp("ts").cast("long")
    prev = F.lag(tsec).over(w)
    brk = F.when(prev.isNull() | ((tsec - prev) > 1800), 1).otherwise(0)
    out = (ev.withColumn("sess", F.sum(brk).over(w))
             .groupBy("user_id")
             .agg(F.countDistinct("sess").alias("n")))
    return {r.user_id: r.n for r in out.collect()}


def test_gap_boundary_exactly_1800s_continues_session(spark):
    t0 = 1_700_000_000
    got = _sessions(spark, [(1, t0), (1, t0 + 1800)])
    assert got == {1: 1}          # gap == 1800 does NOT break


def test_gap_1801s_breaks_session(spark):
    t0 = 1_700_000_000
    got = _sessions(spark, [(1, t0), (1, t0 + 1801)])
    assert got == {1: 2}


def test_sessions_are_per_user(spark):
    t0 = 1_700_000_000
    got = _sessions(spark, [(1, t0), (2, t0 + 10), (1, t0 + 20),
                            (2, t0 + 10_000)])
    assert got == {1: 1, 2: 2}


def test_single_event_user_has_one_session(spark):
    got = _sessions(spark, [(7, 1_700_000_000)])
    assert got == {7: 1}
