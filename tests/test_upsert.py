"""Upsert semantics (reference U1: Hudi keyed last-write-wins, c8:17-23)."""

import pytest
from pyspark.sql import functions as F

from pydata_vector_search_spark.catalog import Catalog
from pydata_vector_search_spark.operators.upsert import merge_last_write_wins, upsert_table


def test_merge_replaces_and_appends(spark):
    old = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    new = spark.createDataFrame([(2, "B"), (3, "c")], "k int, v string")
    got = {r.k: r.v for r in merge_last_write_wins(old, new, "k").collect()}
    assert got == {1: "a", 2: "B", 3: "c"}


def test_merge_idempotent(spark):
    old = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    new = spark.createDataFrame([(2, "B")], "k int, v string")
    once = merge_last_write_wins(old, new, "k")
    twice = merge_last_write_wins(once, new, "k")
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_catalog_upsert_roundtrip(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "cat"))
    df = spark.createDataFrame([(1, 10.0), (2, 20.0)], "k int, x double")
    cat.write("t", df, key="k")
    upsert_table(cat, "t", spark.createDataFrame([(2, 99.0), (5, 50.0)], "k int, x double"))
    got = {r.k: r.x for r in cat.load("t").collect()}
    assert got == {1: 10.0, 2: 99.0, 5: 50.0}
    # reattach from disk (catalog persistence)
    cat2 = Catalog(spark, str(tmp_path / "cat"))
    assert "t" in cat2 and cat2.info("t").key == "k"
