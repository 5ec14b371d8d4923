"""Smoke: the driver contract (entry + every declared query) runs at sf0.001."""

import pytest

import __spark_entry__ as entry


def test_entry_returns_rows(spark):
    df = entry.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"vec_id", "score", "lang"} <= set(df.columns)


@pytest.mark.parametrize("name", sorted(entry.queries()))
def test_declared_query_runs(spark, sf_dir, name):
    df = entry.queries()[name](spark, sf_dir)
    assert df.columns  # schema resolves
    df.limit(5).collect()  # executes


def test_oracle_keys_subset_of_queries():
    assert set(entry.oracle_sql()) <= set(entry.queries())
