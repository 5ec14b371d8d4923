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


def test_zorder_write_localizes_both_columns(spark, tmp_path):
    """Z-order locality: after write_zordered on (l_orderkey, l_partkey),
    each output file covers a small rectangle of BOTH key ranges — the
    property that lets min/max stats prune files for predicates on either
    column. A single-key sort would localize one column and leave the
    other at full spread."""
    import glob

    import pyarrow.parquet as pq

    from pyspark.sql import functions as F

    from pydata_vector_search_spark.catalog import read_table
    from pydata_vector_search_spark.operators.layout import write_zordered

    li = read_table(spark, "/root/testdata/sf0.01", "lineitem") \
        .select("l_orderkey", "l_partkey", "l_extendedprice")
    path = str(tmp_path / "zli")
    write_zordered(li, path, ["l_orderkey", "l_partkey"], num_files=8)

    gmin = li.agg(F.min("l_orderkey"), F.max("l_orderkey"),
                  F.min("l_partkey"), F.max("l_partkey")).head()
    span_o = gmin[1] - gmin[0]
    span_p = gmin[3] - gmin[2]
    files = glob.glob(path + "/*.parquet")
    assert len(files) >= 4
    frac_o, frac_p = [], []
    for f in files:
        md = pq.ParquetFile(f).metadata
        mins = {"l_orderkey": [], "l_partkey": []}
        maxs = {"l_orderkey": [], "l_partkey": []}
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                name = col.path_in_schema
                if name in mins and col.statistics is not None:
                    mins[name].append(col.statistics.min)
                    maxs[name].append(col.statistics.max)
        frac_o.append((max(maxs["l_orderkey"]) - min(mins["l_orderkey"]))
                      / span_o)
        frac_p.append((max(maxs["l_partkey"]) - min(mins["l_partkey"]))
                      / span_p)
    # average per-file coverage well below full span on BOTH dimensions.
    # The discriminating alternative is a single-key sort, which leaves
    # the other dimension at ~1.0; 0.7 keeps that discrimination while
    # tolerating distribution drift across driver testdata generations
    # (observed 0.55-0.61 on different generations of sf0.01).
    avg_o = sum(frac_o) / len(frac_o)
    avg_p = sum(frac_p) / len(frac_p)
    assert avg_o < 0.7, avg_o
    assert avg_p < 0.7, avg_p
    # and content round-trips exactly
    assert spark.read.parquet(path).count() == li.count()


def test_zorder_guards_and_nulls(spark):
    import pytest as _pytest

    from pydata_vector_search_spark.operators.layout import with_zorder
    df = spark.createDataFrame([(1, 2.0), (None, 4.0), (3, None)],
                               "a int, b double")
    out = with_zorder(df, ["a", "b"]).collect()
    assert all(r["__z"] is not None and r["__z"] >= 0 for r in out)
    with _pytest.raises(ValueError, match="exactly 2"):
        with_zorder(df, ["a"])


def test_zorder_all_null_column(spark):
    from pydata_vector_search_spark.operators.layout import with_zorder
    df = spark.createDataFrame([(None, 1.0), (None, 2.0)],
                               "a int, b double")
    out = with_zorder(df, ["a", "b"]).collect()
    assert all(r["__z"] is not None for r in out)
