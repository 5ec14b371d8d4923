"""As-of and range joins vs naive reference computations."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from pydata_vector_search_spark.catalog import read_table
from pydata_vector_search_spark.operators.joins import asof_join, range_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture()
def quotes_trades(spark):
    quotes = spark.createDataFrame(
        [("A", _ts("2024-01-01T10:00:00"), 100.0),
         ("A", _ts("2024-01-01T10:00:05"), 101.0),
         ("A", _ts("2024-01-01T10:00:10"), 102.0),
         ("B", _ts("2024-01-01T10:00:03"), 50.0)],
        "sym string, ts timestamp, px double")
    trades = spark.createDataFrame(
        [("A", _ts("2024-01-01T09:59:59")),   # before any quote
         ("A", _ts("2024-01-01T10:00:05")),   # exactly at a quote (<= match)
         ("A", _ts("2024-01-01T10:00:07")),
         ("A", _ts("2024-01-01T10:00:30")),
         ("B", _ts("2024-01-01T10:00:02")),   # before B's only quote
         ("C", _ts("2024-01-01T10:00:01"))],  # key with no right rows
        "sym string, ts timestamp")
    return quotes, trades


def test_asof_join_semantics(quotes_trades):
    quotes, trades = quotes_trades
    got = {(r.sym, r.ts.isoformat()): r.px_r
           for r in asof_join(trades, quotes, on="sym", time_col="ts",
                              value_cols=["px"]).collect()}
    assert got[("A", "2024-01-01T09:59:59")] is None
    assert got[("A", "2024-01-01T10:00:05")] == 101.0   # <= includes equal ts
    assert got[("A", "2024-01-01T10:00:07")] == 101.0
    assert got[("A", "2024-01-01T10:00:30")] == 102.0
    assert got[("B", "2024-01-01T10:00:02")] is None
    assert got[("C", "2024-01-01T10:00:01")] is None
    assert len(got) == 6                                 # all left rows kept


def test_asof_join_matches_naive_on_fixture(spark):
    ev = read_table(spark, "/root/testdata/sf0.001", "events")
    left = ev.filter(F.col("event_type") == "signup") \
             .select("event_id", "user_id", "ts")
    right = ev.filter(F.col("event_type") == "purchase") \
              .select("user_id", "ts", "value")
    got = {r.event_id: r.value_r
           for r in asof_join(left, right, on="user_id", time_col="ts",
                              value_cols=["value"]).collect()}
    # naive: correlated max-ts lookup
    naive = {}
    rrows = right.collect()
    for l in left.collect():
        cands = [r for r in rrows
                 if r.user_id == l.user_id and r.ts <= l.ts]
        naive[l.event_id] = (max(cands, key=lambda r: r.ts).value
                             if cands else None)
    assert got == naive
    assert any(v is not None for v in got.values())


def test_asof_join_single_shuffle(quotes_trades):
    quotes, trades = quotes_trades
    plan = asof_join(trades, quotes, on="sym", time_col="ts") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_range_join_matches_naive(spark):
    ev = read_table(spark, "/root/testdata/sf0.001", "events")
    purchases = ev.filter(F.col("event_type") == "purchase") \
                  .select("event_id", "user_id", "ts", "value")
    windows = (ev.filter(F.col("event_type") == "signup")
                 .select(F.col("event_id").alias("signup_id"), "user_id",
                         F.col("ts").alias("w_start"),
                         (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("w_end")))
    got = {(r.signup_id, r.event_id)
           for r in range_join(purchases, windows, on="user_id",
                               time_col="ts", start_col="w_start",
                               end_col="w_end", grain_seconds=3600).collect()}
    naive = {(w.signup_id, p.event_id)
             for p in purchases.collect() for w in windows.collect()
             if p.user_id == w.user_id and w.w_start <= p.ts < w.w_end}
    assert got == naive
    assert got  # non-empty on the fixture


def test_range_join_grain_invariance(spark):
    ev = read_table(spark, "/root/testdata/sf0.001", "events")
    purchases = ev.filter(F.col("event_type") == "purchase") \
                  .select("event_id", "user_id", "ts")
    windows = (ev.filter(F.col("event_type") == "signup")
                 .select(F.col("event_id").alias("signup_id"), "user_id",
                         F.col("ts").alias("w_start"),
                         (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("w_end")))
    a = {(r.signup_id, r.event_id) for r in
         range_join(purchases, windows, "user_id", "ts",
                    "w_start", "w_end", grain_seconds=600).collect()}
    b = {(r.signup_id, r.event_id) for r in
         range_join(purchases, windows, "user_id", "ts",
                    "w_start", "w_end", grain_seconds=86400).collect()}
    assert a == b
