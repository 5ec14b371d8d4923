"""Dedup operator properties (SURVEY.md §5.4 + driver-mandate ops)."""

import pytest
from pyspark.sql import functions as F

from pydata_vector_search_spark.catalog import read_table
from pydata_vector_search_spark.operators import dedup
from pydata_vector_search_spark.operators.embedding import HashEncoder, embed_text


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return read_table(spark, sf_dir, "documents").cache()


def test_exact_dedup_keeps_min_id(spark):
    df = spark.createDataFrame(
        [(3, "Hello  World"), (1, "hello world"), (2, "other")],
        "doc_id int, text string")
    kept = sorted(r.doc_id for r in dedup.exact_dedup(df, "text", "doc_id").collect())
    assert kept == [1, 2]


def test_minhash_pairs_subset_of_exact(docs):
    """LSH+verify results ⊆ exact jaccard results, and all ≥ threshold."""
    mh = {(r.id_1, r.id_2): r.jaccard
          for r in dedup.minhash_neardup_pairs(docs, "text", "doc_id",
                                               threshold=0.5).collect()}
    exact = {(r.id_1, r.id_2): r.jaccard
             for r in dedup.jaccard_similarity_join(docs, "text", "doc_id",
                                                    threshold=0.5).collect()}
    assert set(mh) <= set(exact)
    for pair, j in mh.items():
        assert abs(j - exact[pair]) < 1e-12
        assert j >= 0.5


def test_simhash_identical_docs_distance_zero(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta"),
         (3, "totally different words entirely unrelated")],
        "doc_id int, text string")
    got = dedup.simhash_neardup_pairs(df, "text", "doc_id", max_hamming=3).collect()
    pairs = {(r.id_1, r.id_2): r.hamming for r in got}
    assert pairs.get((1, 2)) == 0
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_cosine_topk_pairs_sorted(spark, sf_dir):
    emb = read_table(spark, sf_dir, "embeddings")
    got = dedup.cosine_topk_pairs(emb, "embedding", "vec_id", k=10).collect()
    assert len(got) == 10
    sims = [r.cos_sim for r in got]
    assert sims == sorted(sims, reverse=True)
    assert all(r.id_1 < r.id_2 for r in got)


def test_hyperplane_lsh_subset_of_exact(spark):
    import numpy as np
    rng = np.random.default_rng(0)
    base = rng.standard_normal((5, 16))
    rows = []
    for i, v in enumerate(base):
        rows.append((i * 2, (v / np.linalg.norm(v)).tolist()))
        w = v + rng.standard_normal(16) * 0.01          # near-duplicate
        rows.append((i * 2 + 1, (w / np.linalg.norm(w)).tolist()))
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    exact = {(r.id_1, r.id_2) for r in dedup.cosine_neardup_pairs(
        df, "embedding", "vec_id", threshold=0.99).collect()}
    lsh = {(r.id_1, r.id_2) for r in dedup.hyperplane_lsh_neardup(
        df, "embedding", "vec_id", dim=16, threshold=0.99).collect()}
    assert lsh <= exact
    assert len(exact) == 5  # the 5 constructed near-dup pairs


def test_embed_text_deterministic_unit_norm(spark):
    df = spark.createDataFrame([(1, "hello world"), (2, "hello world"),
                                (3, "spark engine")], "id int, text string")
    out = embed_text(df, "text", encoder=HashEncoder(dim=32)).collect()
    by_id = {r.id: r.embedding for r in out}
    assert by_id[1] == by_id[2]            # deterministic
    assert by_id[1] != by_id[3]
    import math
    n = math.sqrt(sum(x * x for x in by_id[1]))
    assert abs(n - 1.0) < 1e-5             # unit norm
    assert len(by_id[1]) == 32


def test_cosine_topk_pairs_tiny_input(spark):
    """Inputs smaller than the block count leave one-sided/singleton
    groups — must not crash and must still score every pair."""
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.0, 1.0])],
        "vec_id int, embedding array<double>")
    got = dedup.cosine_topk_pairs(df, "embedding", "vec_id", k=3).collect()
    assert len(got) == 3            # all C(3,2) pairs scored
    assert got[0].id_1 == 1 and got[0].id_2 == 2   # most similar first
    thr = dedup.cosine_threshold_pairs(df, "embedding", "vec_id",
                                       threshold=0.9).collect()
    assert {(r.id_1, r.id_2) for r in thr} == {(1, 2)}


def test_cosine_pairs_sparse_block_no_duplicates(spark):
    """Regression: rows concentrated in ONE hash block while the other
    num_blocks-1 blocks are empty. Each off-diagonal group (i, j) then has
    an empty 'b' side; the old code fell into the diagonal branch and
    re-emitted block i's intra-block pairs once per empty partner block
    (every pair appeared num_blocks times). Every pair must appear
    exactly once."""
    from pyspark.sql import functions as SF
    B = 8
    # discover ids that Spark's own xxhash64 sends to the same block
    probe = spark.range(200).select(
        SF.col("id").cast("int").alias("id"),
        SF.pmod(SF.xxhash64(SF.col("id").cast("string")), SF.lit(B))
          .cast("int").alias("blk"))
    by_block = {}
    for r in probe.collect():
        by_block.setdefault(r.blk, []).append(r.id)
    ids = next(v for v in by_block.values() if len(v) >= 3)[:3]
    vecs = [[1.0, 0.0], [0.9, 0.1], [0.0, 1.0]]
    df = spark.createDataFrame(list(zip(ids, vecs)),
                               "vec_id int, embedding array<double>")

    topk = dedup.cosine_topk_pairs(df, "embedding", "vec_id",
                                   k=30, num_blocks=B).collect()
    assert len(topk) == 3                       # C(3,2), no duplicates
    assert len({(r.id_1, r.id_2) for r in topk}) == 3

    thr = dedup.cosine_threshold_pairs(df, "embedding", "vec_id",
                                       threshold=-1.0, num_blocks=B).collect()
    pairs = [(r.id_1, r.id_2) for r in thr]
    assert len(pairs) == 3 and len(set(pairs)) == 3


def test_cosine_topk_pairs_single_row(spark):
    df = spark.createDataFrame([(1, [1.0, 0.0])],
                               "vec_id int, embedding array<double>")
    assert dedup.cosine_topk_pairs(df, "embedding", "vec_id", k=3).count() == 0


def test_minhash_bucket_cap_bounds_candidates(spark):
    rows = [(i, "the exact same document text repeated again and again here")
            for i in range(30)] + [(100, "a completely different text body")]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    uncapped = dedup.minhash_neardup_pairs(df, "text", "doc_id",
                                           threshold=0.9).count()
    capped = dedup.minhash_neardup_pairs(df, "text", "doc_id", threshold=0.9,
                                         max_bucket_size=5).count()
    assert uncapped == 30 * 29 // 2     # quadratic in the hot bucket
    assert capped == 0                  # hot bucket excluded entirely


def test_simhash_block_cap_bounds_candidates(spark):
    rows = [(i, "identical content for every single row of this corpus")
            for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    uncapped = dedup.simhash_neardup_pairs(df, "text", "doc_id").count()
    capped = dedup.simhash_neardup_pairs(df, "text", "doc_id",
                                         max_block_size=4).count()
    assert uncapped == 20 * 19 // 2
    assert capped == 0


def test_jaccard_prefix_matches_count_based(docs):
    a = {(r.id_1, r.id_2): round(r.jaccard, 9) for r in
         dedup.jaccard_similarity_join(docs, "text", "doc_id",
                                       threshold=0.5).collect()}
    b = {(r.id_1, r.id_2): round(r.jaccard, 9) for r in
         dedup.jaccard_similarity_join_prefix(docs, "text", "doc_id",
                                              threshold=0.5).collect()}
    assert a == b and a


def test_jaccard_auto_selection_rule(docs, spark):
    """The auto dispatcher matches both physical strategies exactly, and
    its ratio rule picks count-based on the near-unique corpus and
    PPJoin on a duplicate-heavy one (threshold forced to straddle)."""
    want = {(r.id_1, r.id_2): round(r.jaccard, 9) for r in
            dedup.jaccard_similarity_join(docs, "text", "doc_id",
                                          threshold=0.5).collect()}
    got = {(r.id_1, r.id_2): round(r.jaccard, 9) for r in
           dedup.jaccard_similarity_join_auto(docs, "text", "doc_id",
                                              threshold=0.5).collect()}
    assert got == want and got
    # a tiny threshold forces the PPJoin branch: results must not move
    forced_prefix = {(r.id_1, r.id_2): round(r.jaccard, 9) for r in
                     dedup.jaccard_similarity_join_auto(
                         docs, "text", "doc_id", threshold=0.5,
                         dup_ratio_threshold=0.0).collect()}
    assert forced_prefix == want
    # degenerate corpora don't crash the ratio (empty → count-based)
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert dedup.jaccard_similarity_join_auto(
        empty, "text", "doc_id").count() == 0


def test_jaccard_prefix_broadcast_gate(docs):
    """The candidate broadcast is AQE-gated by default (no forced hint —
    runtime stats decide); both explicit overrides produce IDENTICAL
    results, and the default plan carries no static broadcast hint."""
    want = {(r.id_1, r.id_2): round(r.jaccard, 9) for r in
            dedup.jaccard_similarity_join_prefix(docs, "text", "doc_id",
                                                 threshold=0.5).collect()}
    forced = {(r.id_1, r.id_2): round(r.jaccard, 9) for r in
              dedup.jaccard_similarity_join_prefix(
                  docs, "text", "doc_id", threshold=0.5,
                  broadcast_candidates=True).collect()}
    never = {(r.id_1, r.id_2): round(r.jaccard, 9) for r in
             dedup.jaccard_similarity_join_prefix(
                 docs, "text", "doc_id", threshold=0.5,
                 broadcast_candidates=False).collect()}
    assert want == forced == never and want


def test_simhash_rejects_unguaranteed_hamming(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id int, text string")
    with pytest.raises(ValueError, match="pigeonhole"):
        dedup.simhash_neardup_pairs(df, "text", "doc_id", max_hamming=4)
    # negative radius must raise the same clear guard, not divide by
    # zero in the chunk-width arithmetic (r12 ADVICE)
    for bad in (-1, -5):
        with pytest.raises(ValueError, match="pigeonhole"):
            dedup.simhash_neardup_pairs(df, "text", "doc_id",
                                        max_hamming=bad)


def test_decontaminate_containment_fraction(spark):
    """Exact containment semantics: full copies flag at 1.0, partial
    overlap scores the contained fraction, disjoint docs score 0."""
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta")], "doc_id int, text string")
    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"),   # exact copy -> 1.0
         (2, "alpha beta gamma delta unrelated words entirely"),  # partial
         (3, "totally different content here now")],   # disjoint -> 0.0
        "doc_id int, text string")
    out = {r.doc_id: (r.overlap, r.contaminated)
           for r in dedup.decontaminate(corpus, bench, "text", "doc_id",
                                        threshold=0.8).collect()}
    assert out[1] == (1.0, True)
    assert out[3] == (0.0, False)
    ov2, flag2 = out[2]
    assert 0.0 < ov2 < 0.8 and flag2 is False
    # doc 2: shingles = 5 trigrams, of which 'alpha beta gamma' and
    # 'beta gamma delta' are in the benchmark -> 2/5
    assert abs(ov2 - 0.4) < 1e-9


def test_semantic_dedup_transitive_keep_min(spark):
    """A~B and B~C (but not A~C) must still collapse to one survivor (the
    min id); far-away vectors survive untouched."""
    import math

    # unit vectors at angles 0, 10, 20 degrees: cos(10deg)=.985,
    # cos(20deg)=.94 -> with threshold .97 only adjacent pairs link;
    # 90 degrees is clearly distinct
    def vec(deg):
        r = math.radians(deg)
        return [math.cos(r), math.sin(r)] + [0.0] * 6
    df = spark.createDataFrame(
        [(1, vec(0)), (2, vec(10)), (3, vec(20)), (9, vec(90))],
        "vec_id int, embedding array<double>")
    kept = dedup.semantic_dedup(df, "embedding", "vec_id", dim=8,
                                threshold=0.97, num_planes=1, seed=7,
                                round_to=6)
    assert sorted(r.vec_id for r in kept.collect()) == [1, 9]


def test_cross_dedup_drops_reference_copies(spark):
    """Corpus docs copied from (or trivially perturbed versions of)
    reference docs drop; unrelated corpus docs survive."""
    ref = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog today"),
         (101, "completely different reference content goes here now")],
        "doc_id int, text string")
    corpus = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog today"),  # copy
         (2, "the quick brown fox jumps over the lazy dog"),        # near
         (3, "unrelated fresh corpus document about spark engines")],
        "doc_id int, text string")
    kept = sorted(r.doc_id for r in dedup.cross_dedup_minhash(
        corpus, ref, "text", "doc_id", threshold=0.5).collect())
    assert kept == [3]
    # reference-side hot-bucket cap degrades to keeping everything
    capped = sorted(r.doc_id for r in dedup.cross_dedup_minhash(
        corpus, ref, "text", "doc_id", threshold=0.5,
        max_bucket_df=0).collect())
    assert capped == [1, 2, 3]


def test_fan_out_guard(spark):
    """r13: _fan_out is the identity when the input already carries the
    target parallelism (a cluster-scale input must not be re-shuffled
    just to re-bucket), and still fans a single-partition input out to
    every core."""
    target = spark.sparkContext.defaultParallelism
    one = spark.createDataFrame([(i, f"t{i}") for i in range(100)],
                                "doc_id long, text string").coalesce(1)
    assert dedup._fan_out(one, "doc_id").rdd.getNumPartitions() == target
    wide = one.repartition(target * 2, "doc_id")
    out = dedup._fan_out(wide, "doc_id")
    assert out is wide  # identity — no new exchange on top
