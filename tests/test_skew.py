"""Salted aggregation/join must be row-identical to the plain rewrites."""

import pytest
from pyspark.sql import functions as F

from pydata_vector_search_spark.catalog import read_table
from pydata_vector_search_spark.operators.skew import salted_aggregate, salted_join


def test_salted_aggregate_matches_plain(spark):
    ev = read_table(spark, "/root/testdata/sf0.001", "events")
    got = {r.event_type: (r.n, round(r.total, 6), round(r.mean, 6), r.lo, r.hi)
           for r in salted_aggregate(
               ev, ["event_type"],
               {"n": ("count", "value"), "total": ("sum", "value"),
                "mean": ("avg", "value"), "lo": ("min", "value"),
                "hi": ("max", "value")},
               num_salts=8, spread_col="event_id").collect()}
    exp = {r.event_type: (r.n, round(r.total, 6), round(r.mean, 6), r.lo, r.hi)
           for r in ev.groupBy("event_type")
                      .agg(F.count("value").alias("n"),
                           F.sum("value").alias("total"),
                           F.avg("value").alias("mean"),
                           F.min("value").alias("lo"),
                           F.max("value").alias("hi")).collect()}
    assert got == exp


def test_salted_aggregate_two_exchanges(spark):
    ev = read_table(spark, "/root/testdata/sf0.001", "events")
    plan = salted_aggregate(ev, ["event_type"], {"n": ("count", "value")},
                            num_salts=8, spread_col="event_id") \
        ._jdf.queryExecution().executedPlan().toString()
    # phase 1 shuffles on (key, salt), phase 2 on key
    assert plan.count("Exchange hashpartitioning") == 2


def test_salted_join_matches_plain(spark):
    o = read_table(spark, "/root/testdata/sf0.001", "orders")
    c = read_table(spark, "/root/testdata/sf0.001", "customer") \
        .select("c_custkey", "c_mktsegment")
    got = sorted((r.o_orderkey, r.c_mktsegment) for r in
                 salted_join(o.withColumnRenamed("o_custkey", "custkey"),
                             c.withColumnRenamed("c_custkey", "custkey"),
                             on="custkey", num_salts=4,
                             spread_col="o_orderkey").collect())
    exp = sorted((r.o_orderkey, r.c_mktsegment) for r in
                 o.join(c, o.o_custkey == c.c_custkey, "inner").collect())
    assert got == exp and got


def test_salted_aggregate_rejects_unknown_fn(spark):
    ev = read_table(spark, "/root/testdata/sf0.001", "events")
    with pytest.raises(ValueError, match="unsupported"):
        salted_aggregate(ev, ["event_type"], {"m": ("median", "value")})
