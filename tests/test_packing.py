"""Sequence packing + temperature mixing (operators/packing)."""

import pytest
from pyspark.sql import functions as F

from pydata_vector_search_spark.operators.packing import (pack_sequences,
                                                          temperature_mix)


def _docs(spark, lens, span=100):
    return spark.createDataFrame(
        [(i, ln) for i, ln in enumerate(lens)], "doc_id long, n_tok long")


def test_pack_next_fit_semantics(spark):
    """Greedy next-fit in id order: bins fill to capacity, a non-fitting
    doc opens the next bin, an oversized doc gets its own bin."""
    df = _docs(spark, [100, 100, 60, 200, 300, 10])
    out = {r.doc_id: (r.bin_id, r.bin_pos) for r in pack_sequences(
        df, "doc_id", "n_tok", max_len=256, block_span=100).collect()}
    assert out[0] == (0, 0) and out[1] == (0, 1)   # 100+100 = 200 fits
    assert out[2] == (1, 0)          # 200+60 = 260 > 256 → bin 1
    assert out[3] == (2, 0)          # 60+200 = 260 > 256 → bin 2
    assert out[4] == (3, 0)          # oversized 300 gets its own bin
    assert out[5] == (4, 0)          # bin 3 already over capacity


def test_pack_exact_layout(spark):
    """Pin the exact layout for a hand-checked sequence."""
    df = _docs(spark, [100, 100, 50, 200, 300, 10])
    out = {r.doc_id: (r.bin_id, r.bin_pos) for r in pack_sequences(
        df, "doc_id", "n_tok", max_len=256, block_span=100).collect()}
    assert out == {0: (0, 0), 1: (0, 1),       # 100+100=200
                   2: (0, 2),                  # +50=250 fits
                   3: (1, 0),                  # 200 opens bin 1
                   4: (2, 0),                  # 300 > 256: own bin
                   5: (3, 0)}                  # 300 overflowed bin 2


def test_pack_blocks_are_independent_and_deterministic(spark):
    """Bins never cross block boundaries; result identical under any
    input ordering/partitioning; bin ids globally unique."""
    lens = [((i * 37) % 90) + 10 for i in range(250)]
    df = _docs(spark, lens)
    a = pack_sequences(df.orderBy("doc_id"), "doc_id", "n_tok",
                       max_len=128, block_span=100)
    b = pack_sequences(df.orderBy(F.col("doc_id").desc()).repartition(7),
                       "doc_id", "n_tok", max_len=128, block_span=100)
    ra = sorted((r.doc_id, r.bin_id, r.bin_pos) for r in a.collect())
    rb = sorted((r.doc_id, r.bin_id, r.bin_pos) for r in b.collect())
    assert ra == rb
    # block isolation: bin_id // block_span == doc_id // block_span
    assert all(bid // 100 == did // 100 for did, bid, _ in ra)
    # capacity invariant (oversized docs excluded — none here)
    fills = {}
    for did, bid, _ in ra:
        fills[bid] = fills.get(bid, 0) + lens[did]
    assert all(v <= 128 for v in fills.values())


def test_pack_block_identity_floor_and_64bit_exact(spark):
    """Block identity is exact long FLOOR division (ADVICE r06): negative
    ids floor (-5 // 100 = -1, not the truncate-toward-zero 0 that would
    double-width the block straddling 0), and ids beyond 2^53 — where
    the old double division rounded adjacent ids together — keep exact,
    distinct block identity."""
    big = (1 << 60) + 3          # not representable gaps at double prec.
    ids = [-205, -5, -1, 0, 99, big, big + 100, big + 200]
    df = spark.createDataFrame([(i, 10) for i in ids],
                               "doc_id long, n_tok long")
    out = {r.doc_id: r.bin_id for r in pack_sequences(
        df, "doc_id", "n_tok", max_len=1000, block_span=100).collect()}
    blk = {i: out[i] // 100 for i in ids}
    assert blk == {i: i // 100 for i in ids}        # python floor-div
    # the three huge ids land in three DISTINCT consecutive blocks
    # (double arithmetic would have merged them: big/100 rounds equal)
    assert len({blk[big], blk[big + 100], blk[big + 200]}) == 3
    # and every bin holds only docs of its own block → no collisions
    # between the pre-0 block and block 0
    assert out[-5] != out[0]


def test_temperature_mix_shares_and_determinism(spark):
    """alpha flattens the source distribution; selection is a pure hash
    rule (same rows under re-partitioning); rates capped at 1."""
    rows = [(i, "big" if i < 900 else "small") for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, src string")
    out = temperature_mix(df, "doc_id", "src", alpha=0.0,
                          sample_frac=0.2, seed=1)
    got = {r[0]: r[1] for r in
           out.groupBy("src").count().collect()}
    # alpha=0: equal targets of 100 each; small (n=100) capped at 100
    assert got["small"] == 100                 # rate 1.0 keeps everything
    assert 60 <= got["big"] <= 140             # ~100 of 900 by hash rule
    # deterministic under partitioning
    again = temperature_mix(df.repartition(13), "doc_id", "src",
                            alpha=0.0, sample_frac=0.2, seed=1)
    assert sorted(r.doc_id for r in out.collect()) == \
           sorted(r.doc_id for r in again.collect())
    # alpha=1 is plain uniform sampling: every group rate == sample_frac
    uni = temperature_mix(df, "doc_id", "src", alpha=1.0,
                          sample_frac=0.5, seed=1)
    assert {round(r.mix_rate, 9) for r in
            uni.select("mix_rate").distinct().collect()} == {0.5}


def test_shard_shuffle_membership_and_physical_order(spark, sf_dir):
    from pydata_vector_search_spark.catalog import read_table
    from pydata_vector_search_spark.operators.packing import shard_shuffle

    docs = read_table(spark, sf_dir, "documents").select("doc_id")
    out = shard_shuffle(docs, "doc_id", num_shards=4, seed=7)

    # physical contract: each output partition holds whole shards,
    # sorted by (shard, key, id) — checked on the actual partitions
    def check(it):
        prev = None
        for r in it:
            cur = (r.shard, r.shard_key, r.doc_id)
            assert prev is None or prev <= cur
            prev = cur
        yield (1,)
    assert out.rdd.mapPartitions(check).count() == out.rdd.getNumPartitions()

    # shard membership + order key are pure functions of id: invariant
    # under input partitioning, and a different seed permutes them
    a = sorted(map(tuple, out.collect()))
    b = sorted(map(tuple, shard_shuffle(docs.repartition(13), "doc_id",
                                        num_shards=4, seed=7).collect()))
    assert a == b
    c = sorted(map(tuple, shard_shuffle(docs, "doc_id", num_shards=4,
                                        seed=8).collect()))
    assert a != c

    # every row lands in exactly one shard and none are lost
    n = docs.count()
    per = out.groupBy("shard").count().collect()
    assert sum(r["count"] for r in per) == n and len(per) == 4


def test_shard_shuffle_invalid_shards_raises(spark):
    from pydata_vector_search_spark.operators.packing import shard_shuffle
    df = spark.range(5).withColumnRenamed("id", "doc_id")
    with pytest.raises(ValueError, match="num_shards"):
        shard_shuffle(df, "doc_id", 0)


def test_temperature_mix_token_weighted(spark):
    """weight_col switches the mixing mass to token counts: a group of
    few huge docs and a group of many tiny docs with equal token mass
    get EQUAL rates at alpha=0 (count-based mixing would skew); the
    default count path is unchanged by the refactor; zero-mass groups
    keep rate 1.0 instead of dividing by zero."""
    rows = ([(i, "big", 100) for i in range(10)]          # 1000 tokens
            + [(100 + i, "small", 1) for i in range(1000)]  # 1000 tokens
            + [(5000 + i, "empty", 0) for i in range(5)])   # 0 tokens
    df = spark.createDataFrame(rows, "doc_id long, src string, w long")
    out = temperature_mix(df, "doc_id", "src", alpha=0.0,
                          sample_frac=0.5, seed=3, weight_col="w")
    rates = {r.src: r.mix_rate for r in
             out.select("src", "mix_rate").distinct().collect()}
    # equal token mass -> equal rates for big/small; zero-mass kept
    assert rates["big"] == rates["small"]
    assert rates["empty"] == 1.0
    # kept token mass tracks the rate (hash rule is doc-independent of
    # length, so expectation holds; allow sampling slack)
    kept = {r.src: r.kw or 0 for r in
            out.groupBy("src").agg(F.sum("w").alias("kw")).collect()}
    expect = 1000 * rates["big"]
    assert 0.6 * expect <= kept["big"] <= 1.4 * expect
    assert 0.6 * expect <= kept["small"] <= 1.4 * expect
    # default path (weight_col=None) is bit-identical to before the
    # refactor: alpha=1 uniform rates
    uni = temperature_mix(df, "doc_id", "src", alpha=1.0,
                          sample_frac=0.5, seed=3)
    assert {r.mix_rate for r in
            uni.select("mix_rate").distinct().collect()} == {0.5}


def test_temperature_mix_degenerate_weights(spark):
    """ADVICE r07: all-NULL weights in a group coalesce to mass 0 (the
    keep-outright branch) instead of a driver TypeError; a negative
    group mass raises ValueError instead of going complex in n**alpha."""
    rows = [(1, "a", 10), (2, "a", 10),
            (3, "nullish", None), (4, "nullish", None)]
    df = spark.createDataFrame(rows, "doc_id long, src string, w long")
    out = temperature_mix(df, "doc_id", "src", alpha=0.5,
                          sample_frac=0.5, seed=1, weight_col="w")
    rates = {r.src: r.mix_rate for r in
             out.select("src", "mix_rate").distinct().collect()}
    assert rates["nullish"] == 1.0          # zero-mass group kept outright
    assert out.filter(F.col("src") == "nullish").count() == 2
    neg = spark.createDataFrame([(1, "a", -5), (2, "a", 2)],
                                "doc_id long, src string, w long")
    with pytest.raises(ValueError, match="negative total weight"):
        temperature_mix(neg, "doc_id", "src", weight_col="w")


def test_pack_sequences_invalid_params_raise(spark):
    """ADVICE r07: block_span/max_len < 1 fail fast at entry (a zero
    span would NULL every block id and crash inside the Arrow batch)."""
    df = (spark.range(5).withColumnRenamed("id", "doc_id")
               .withColumn("n_tok", F.lit(10)))
    with pytest.raises(ValueError, match="block_span"):
        pack_sequences(df, "doc_id", "n_tok", max_len=16, block_span=0)
    with pytest.raises(ValueError, match="max_len"):
        pack_sequences(df, "doc_id", "n_tok", max_len=0, block_span=16)
