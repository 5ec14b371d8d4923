"""S1 HuggingFace source adapter (import-gated in this container) +
generic external-format registration (csv/json)."""

import pytest
from pyspark.sql.types import (IntegerType, StringType, StructField,
                               StructType)

from pydata_vector_search_spark.catalog import Catalog
from pydata_vector_search_spark.sources import load_hf_dataset


def test_hf_source_raises_clear_error_without_datasets(spark):
    with pytest.raises(ImportError, match="parquet"):
        load_hf_dataset(spark, "nathansutton/data-science-job-descriptions")


def test_register_csv_source(spark, tmp_path):
    p = tmp_path / "t.csv"
    p.write_text("k,v\n1,a\n2,b\n")
    cat = Catalog(spark, str(tmp_path / "cat"))
    cat.register_path("t", str(p), format="csv", header=True,
                      schema=StructType([StructField("k", IntegerType()),
                                         StructField("v", StringType())]))
    rows = {(r.k, r.v) for r in cat.load("t").collect()}
    assert rows == {(1, "a"), (2, "b")}
    # relational ops compose on top, same as any table
    assert cat.load("t").filter("k = 2").count() == 1


def test_register_json_source(spark, tmp_path):
    p = tmp_path / "t.json"
    p.write_text('{"k": 1, "v": "a"}\n{"k": 2, "v": "b"}\n')
    cat = Catalog(spark, str(tmp_path / "cat"))
    cat.register_path("t", str(p), format="json")
    assert {(r.k, r.v) for r in cat.load("t").collect()} == {(1, "a"), (2, "b")}


def test_external_source_lands_into_managed_parquet(spark, tmp_path):
    """The scale path: land a text-format source ONCE into a managed
    parquet table; downstream reads are columnar."""
    p = tmp_path / "t.csv"
    p.write_text("k,v\n1,a\n")
    cat = Catalog(spark, str(tmp_path / "cat"))
    cat.register_path("t_raw", str(p), format="csv", header=True,
                      inferSchema=True)
    cat.write("t", cat.load("t_raw"), key="k")
    assert cat.info("t").format == "parquet"
    assert [(r.k, r.v) for r in cat.load("t").collect()] == [(1, "a")]
