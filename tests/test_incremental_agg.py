"""Incrementally-maintained materialized aggregates (operators/incremental_agg)."""

import pytest
from pyspark.sql import functions as F

from pydata_vector_search_spark.catalog import Catalog
from pydata_vector_search_spark.operators.incremental_agg import (create_agg,
                                                                  refresh_agg)
from pydata_vector_search_spark.operators.upsert import (delete_where,
                                                         upsert_table)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k int, g string, x double")


def _snap(cat, name):
    return sorted((r.g, r.n_rows, round(r.sx, 6))
                  for r in cat.load(name).collect())


def _full(cat, src):
    return sorted((r.g, r.n, round(r.sx, 6)) for r in
                  cat.load(src).groupBy("g")
                  .agg(F.count(F.lit(1)).cast("long").alias("n"),
                       F.coalesce(F.sum("x"), F.lit(0.0)).alias("sx"))
                  .collect())


def test_refresh_equals_full_recompute(spark, tmp_path):
    """Upserts (value changes + inserts), deletes, a fully-emptied group,
    and a brand-new group — after each refresh the materialized table
    equals the batch groupBy of the current snapshot."""
    cat = Catalog(spark, str(tmp_path / "ivm"))
    cat.write("t", _df(spark, [(1, "a", 1.0), (2, "a", 2.0),
                               (3, "b", 3.0), (4, "c", 4.0)]), key="k")
    create_agg(cat, "t", "t_by_g", ["g"], {"sx": "x"})
    assert _snap(cat, "t_by_g") == _full(cat, "t")

    # update k=2 (a: 2.0 -> 20.0), move k=3 from b to d (group death +
    # birth), insert k=5 into c
    upsert_table(cat, "t", _df(spark, [(2, "a", 20.0), (3, "d", 3.5),
                                       (5, "c", 5.0)]))
    out = refresh_agg(cat, "t", "t_by_g")
    assert out["refreshed"] is True
    assert _snap(cat, "t_by_g") == _full(cat, "t")
    assert ("b", 1, 3.0) not in _snap(cat, "t_by_g")   # b died

    # delete every c row; no-op refresh afterwards
    delete_where(cat, "t", "g = 'c'")
    refresh_agg(cat, "t", "t_by_g")
    snap = _snap(cat, "t_by_g")
    assert snap == _full(cat, "t") and not any(g == "c" for g, *_ in snap)
    assert refresh_agg(cat, "t", "t_by_g")["refreshed"] is False


def test_refresh_survives_catalog_reattach(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "ivm2"))
    cat.write("t", _df(spark, [(1, "a", 1.0)]), key="k")
    create_agg(cat, "t", "agg", ["g"], {"sx": "x"})
    upsert_table(cat, "t", _df(spark, [(2, "a", 2.0)]))

    cat2 = Catalog(spark, str(tmp_path / "ivm2"))     # fresh attach
    assert refresh_agg(cat2, "t", "agg")["refreshed"] is True
    assert _snap(cat2, "agg") == [("a", 2, 3.0)]


def test_create_agg_requires_key(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "ivm3"))
    cat.write("t", _df(spark, [(1, "a", 1.0)]))       # keyless
    with pytest.raises(ValueError, match="record key"):
        create_agg(cat, "t", "agg", ["g"], {"sx": "x"})


def test_purge_rebuilds_registered_aggregates(spark, tmp_path):
    """GDPR purge must not leave materialized rollups carrying the purged
    rows' contributions (purge is not a commit, so IVM refresh would
    never retract them) — they are rebuilt from the purged snapshot."""
    cat = Catalog(spark, str(tmp_path / "pivm"))
    cat.write("t", _df(spark, [(1, "a", 1.0), (2, "a", 2.0),
                               (3, "b", 3.0)]), key="k")
    create_agg(cat, "t", "agg", ["g"], {"sx": "x"})
    out = cat.purge_keys("t", [2])
    assert out["aggregates_rebuilt"] == ["agg"]
    assert _snap(cat, "agg") == [("a", 1, 1.0), ("b", 1, 3.0)]
    # and refresh still works afterwards
    upsert_table(cat, "t", _df(spark, [(9, "b", 9.0)]))
    assert refresh_agg(cat, "t", "agg")["refreshed"] is True
    assert _snap(cat, "agg") == [("a", 1, 1.0), ("b", 2, 12.0)]


def test_refresh_handles_null_group_keys(spark, tmp_path):
    """A NULL group value is one group, not three: refresh must merge the
    old/new/current contributions null-safely."""
    cat = Catalog(spark, str(tmp_path / "ivmn"))
    cat.write("t", _df(spark, [(1, None, 1.0), (2, None, 2.0),
                               (3, "b", 3.0)]), key="k")
    create_agg(cat, "t", "agg", ["g"], {"sx": "x"})
    upsert_table(cat, "t", _df(spark, [(2, None, 20.0), (4, None, 4.0)]))
    refresh_agg(cat, "t", "agg")
    got = sorted(((r.g or "<null>"), r.n_rows, round(r.sx, 6))
                 for r in cat.load("agg").collect())
    assert got == [("<null>", 3, 25.0), ("b", 1, 3.0)]


def _snap_mm(cat, name):
    return sorted((r.g, r.n_rows, round(r.sx, 6), r.mn, r.mx)
                  for r in cat.load(name).collect())


def _full_mm(cat, src):
    return sorted((r.g, r.n, round(r.sx, 6), r.mn, r.mx) for r in
                  cat.load(src).groupBy("g")
                  .agg(F.count(F.lit(1)).cast("long").alias("n"),
                       F.coalesce(F.sum("x"), F.lit(0.0)).alias("sx"),
                       F.min("x").alias("mn"), F.max("x").alias("mx"))
                  .collect())


def test_minmax_refresh_group_scoped_recompute(spark, tmp_path):
    """VERDICT r05 #8: MIN/MAX measures switch refresh to group-scoped
    recompute — including the case delta arithmetic cannot serve:
    deleting the current maximum must resurface the runner-up."""
    cat = Catalog(spark, str(tmp_path / "ivmm"))
    cat.write("t", _df(spark, [(1, "a", 1.0), (2, "a", 9.0),
                               (3, "b", 3.0), (4, "b", 7.0)]), key="k")
    create_agg(cat, "t", "agg", ["g"], {"sx": "x"},
               mins={"mn": "x"}, maxs={"mx": "x"})
    assert _snap_mm(cat, "agg") == _full_mm(cat, "t")

    # delete the max of group a: runner-up 1.0 must become the new max
    delete_where(cat, "t", "k = 2")
    assert refresh_agg(cat, "t", "agg")["refreshed"] is True
    assert _snap_mm(cat, "agg") == _full_mm(cat, "t")
    a_row = [r for r in _snap_mm(cat, "agg") if r[0] == "a"][0]
    assert a_row == ("a", 1, 1.0, 1.0, 1.0)

    # untouched group b must carry over unchanged; group birth + death
    upsert_table(cat, "t", _df(spark, [(1, "c", -5.0), (5, "c", 2.0)]))
    refresh_agg(cat, "t", "agg")
    assert _snap_mm(cat, "agg") == _full_mm(cat, "t")
    assert not any(g == "a" for g, *_ in _snap_mm(cat, "agg"))  # a died
    assert refresh_agg(cat, "t", "agg")["refreshed"] is False


def test_minmax_refresh_model_check(spark, tmp_path):
    """Random mutation history over min/max rollups: after every refresh
    the materialized table equals the batch recompute (the same model
    check the sum-only path has)."""
    import random

    rng = random.Random(17)
    cat = Catalog(spark, str(tmp_path / "ivmmc"))
    rows = [(k, rng.choice("abcd"), round(rng.uniform(-50, 50), 2))
            for k in range(30)]
    cat.write("t", _df(spark, rows), key="k")
    create_agg(cat, "t", "agg", ["g"], {"sx": "x"},
               mins={"mn": "x"}, maxs={"mx": "x"})
    next_k = 30
    for _ in range(4):
        op = rng.choice(["upsert", "delete"])
        if op == "upsert":
            batch = [(rng.randrange(next_k + 5), rng.choice("abcde"),
                      round(rng.uniform(-50, 50), 2))
                     for _ in range(rng.randrange(1, 8))]
            batch = list({b[0]: b for b in batch}.values())
            next_k += 5
            upsert_table(cat, "t", _df(spark, batch))
        else:
            delete_where(cat, "t", f"k % 7 = {rng.randrange(7)}")
        refresh_agg(cat, "t", "agg")
        assert _snap_mm(cat, "agg") == _full_mm(cat, "t")


def test_minmax_refresh_null_groups(spark, tmp_path):
    """NULL group keys stay one group through the semi/anti joins of the
    recompute path (eqNullSafe, not plain equality)."""
    cat = Catalog(spark, str(tmp_path / "ivmmn"))
    cat.write("t", _df(spark, [(1, None, 5.0), (2, None, 1.0),
                               (3, "b", 3.0)]), key="k")
    create_agg(cat, "t", "agg", ["g"], {"sx": "x"}, maxs={"mx": "x"})
    delete_where(cat, "t", "k = 1")          # NULL group loses its max
    refresh_agg(cat, "t", "agg")
    got = sorted(((r.g or "<null>"), r.n_rows, r.mx)
                 for r in cat.load("agg").collect())
    assert got == [("<null>", 1, 1.0), ("b", 1, 3.0)]
