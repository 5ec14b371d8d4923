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


def test_orc_roundtrip_and_schema_guard(spark, tmp_path):
    """ORC write/read round-trips scalars and array<float> exactly; the
    expected-schema check verifies the files' own footer schema and
    raises on upstream type drift instead of silently reconciling."""
    import pytest

    from pydata_vector_search_spark.sources import read_orc, write_orc

    df = spark.createDataFrame(
        [(1, "a", [1.5, -2.25]), (2, "b", [0.0, 3.75])],
        "id bigint, s string, v array<float>")
    p = str(tmp_path / "orc")
    write_orc(df, p)
    back = read_orc(spark, p, "id bigint, s string, v array<float>")
    assert sorted(map(tuple, back.collect())) == \
           sorted(map(tuple, df.collect()))
    # projection/order comes from the expected schema
    assert back.columns == ["id", "s", "v"]
    with pytest.raises(ValueError, match="missing"):
        read_orc(spark, p, "id bigint, nope string")
    with pytest.raises(ValueError, match="expected"):
        read_orc(spark, p, "id int, s string")


def test_orc_partitioned_layout(spark, tmp_path):
    """partition_by produces Hive-style dirs that Spark reads back with
    partition pruning available."""
    import os

    from pydata_vector_search_spark.sources import read_orc, write_orc

    df = spark.createDataFrame([(i, "x" * i, "en" if i % 2 else "de")
                                for i in range(10)],
                               "id bigint, t string, lang string")
    p = str(tmp_path / "part_orc")
    write_orc(df, p, partition_by=["lang"])
    assert sorted(d for d in os.listdir(p) if d.startswith("lang=")) == \
           ["lang=de", "lang=en"]
    back = read_orc(spark, p)
    assert back.filter("lang = 'en'").count() == 5
