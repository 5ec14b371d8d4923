"""Bucketed tables: co-located joins plan with zero exchanges."""

import pytest

from pydata_vector_search_spark.catalog import Catalog, read_table


@pytest.fixture(scope="module")
def cat(spark, sf_dir, tmp_path_factory):
    c = Catalog(spark, str(tmp_path_factory.mktemp("bucketed")))
    o = read_table(spark, sf_dir, "orders") \
        .withColumnRenamed("o_custkey", "custkey")
    cu = read_table(spark, sf_dir, "customer") \
        .withColumnRenamed("c_custkey", "custkey")
    c.write_bucketed("orders_b", o, key="custkey", num_buckets=8)
    c.write_bucketed("customer_b", cu, key="custkey", num_buckets=8)
    return c


def test_bucketed_join_no_exchange(spark, cat):
    o = cat.load("orders_b")
    cu = cat.load("customer_b")
    # disable broadcast so the co-location is what saves the shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = o.join(cu, "custkey", "inner")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan
        assert "SortMergeJoin" in plan
        assert j.count() > 0
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_results_match_plain(spark, sf_dir, cat):
    o = read_table(spark, sf_dir, "orders")
    cu = read_table(spark, sf_dir, "customer")
    exp = o.join(cu, o.o_custkey == cu.c_custkey, "inner").count()
    got = cat.load("orders_b").join(cat.load("customer_b"),
                                    "custkey", "inner").count()
    assert got == exp


def test_bucketed_reload_metadata(cat):
    assert cat.info("orders_b").num_buckets == 8


def test_clustered_write_prunes_on_sort_key(spark, sf_dir, tmp_path):
    """Sort-clustered write → the range predicate reaches the parquet scan
    (PushedFilters on the sort key), enabling row-group min/max skipping."""
    from pyspark.sql import functions as F

    li = read_table(spark, sf_dir, "lineitem")
    path = str(tmp_path / "li_clustered")
    (li.repartitionByRange(4, "l_shipdate")
       .sortWithinPartitions("l_shipdate")
       .write.mode("overwrite").parquet(path))
    back = spark.read.parquet(path).filter(
        (F.col("l_shipdate") >= "1996-01-01") &
        (F.col("l_shipdate") < "1996-04-01"))
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    assert "GreaterThanOrEqual(l_shipdate" in plan
    assert "LessThan(l_shipdate" in plan
    assert back.count() > 0
