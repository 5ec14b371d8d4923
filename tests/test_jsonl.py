"""JSONL source/sink: round-trip fidelity + corrupt-line quarantine."""

from pyspark.sql import functions as F

from pydata_vector_search_spark.sources import (read_jsonl,
                                                read_jsonl_quarantine,
                                                split_corrupt, write_jsonl)


def _write_fixture(spark, tmp_path):
    import os
    df = spark.createDataFrame(
        [(1, "hello", "en"), (2, "mundo", "es"), (3, None, "fr")],
        "id bigint, text string, lang string")
    p = str(tmp_path / "docs")
    write_jsonl(df, p)
    with open(os.path.join(p, "part-zz-corrupt.json"), "w") as fh:
        fh.write('{"id": 9, "text": "trunc\n')
        fh.write('garbage line\n')
        fh.write('\n')                     # blank: not quarantined
    return df, p


def test_split_corrupt_cached(spark, tmp_path):
    df, p = _write_fixture(spark, tmp_path)
    raw = read_jsonl(spark, p, "id bigint, text string, lang string")
    clean, bad = split_corrupt(raw)
    assert sorted((r.id, r.text, r.lang) for r in clean.collect()) == \
        sorted((r.id, r.text, r.lang) for r in df.collect())
    assert bad.count() == 2
    assert {r.raw_line for r in bad.collect()} == \
        {'{"id": 9, "text": "trunc', "garbage line"}


def test_read_jsonl_quarantine_scan_based(spark, tmp_path):
    df, p = _write_fixture(spark, tmp_path)
    clean, bad = read_jsonl_quarantine(
        spark, p, "id bigint, text string, lang string")
    assert clean.count() == 3
    assert clean.filter(F.col("text").isNull()).count() == 1  # NULL survives
    assert bad.count() == 2


def test_write_jsonl_compression(spark, tmp_path):
    import glob
    df = spark.createDataFrame([(1, "x")], "id bigint, t string")
    p = str(tmp_path / "gz")
    write_jsonl(df, p, compression="gzip")
    assert glob.glob(p + "/*.json.gz")
    back = read_jsonl(spark, p, "id bigint, t string")
    assert [(r.id, r.t) for r in back.collect()] == [(1, "x")]
