"""Product quantization (operators/pq): encode/ADC/search properties."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pydata_vector_search_spark.catalog import read_table
from pydata_vector_search_spark.operators import knn, pq


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return read_table(spark, sf_dir, "embeddings").cache()


def test_pq_codes_shape_and_determinism(emb):
    cb = pq.pq_train(emb, "embedding", m=8, k_codes=16, seed=3)
    assert cb.books.shape == (8, 16, 8)          # 64-dim fixtures
    enc1 = {r.vec_id: list(r.pq_code) for r in
            pq.pq_encode(emb, "embedding", cb).collect()}
    enc2 = {r.vec_id: list(r.pq_code) for r in
            pq.pq_encode(emb, "embedding", cb).collect()}
    assert enc1 == enc2
    assert all(len(c) == 8 for c in enc1.values())


def test_pq_full_shortlist_equals_exact(emb, spark):
    """shortlist >= corpus makes the ADC stage pure routing: the exact
    re-rank must reproduce exact KNN bit for bit."""
    n = emb.count()
    qv = [float(x) for x in emb.orderBy("vec_id").first().embedding]
    cb = pq.pq_train(emb, "embedding", m=8, k_codes=32, seed=3,
                     metric="cosine")
    coded = pq.pq_encode(emb, "embedding", cb)
    got = [(r.vec_id, r._distance) for r in pq.pq_search(
        coded, "embedding", "pq_code", cb, qv, k=10, shortlist=n,
        tiebreaker="vec_id", round_to=6).collect()]
    want = [(r.vec_id, r._distance) for r in knn.vector_search(
        emb, "embedding", qv, k=10, metric="cosine",
        tiebreaker="vec_id", round_to=6).collect()]
    assert got == want


def test_pq_small_shortlist_recall(emb):
    """A 64-row shortlist over the 500-row fixture corpus must keep high
    top-10 recall — the ADC ordering is an approximation, not noise."""
    qv = [float(x) for x in emb.orderBy("vec_id").first().embedding]
    cb = pq.pq_train(emb, "embedding", m=8, k_codes=64, seed=3,
                     metric="cosine")
    coded = pq.pq_encode(emb, "embedding", cb)
    got = {r.vec_id for r in pq.pq_search(
        coded, "embedding", "pq_code", cb, qv, k=10, shortlist=64,
        tiebreaker="vec_id").collect()}
    want = {r.vec_id for r in knn.vector_search(
        emb, "embedding", qv, k=10, metric="cosine",
        tiebreaker="vec_id").collect()}
    assert len(got & want) >= 7                  # >=70% top-10 recall


def test_pq_adc_close_to_true_distance(emb):
    """ADC approximates the true squared L2 in the normalized space:
    mean absolute error well under the distance scale."""
    qv = [float(x) for x in emb.orderBy("vec_id").first().embedding]
    cb = pq.pq_train(emb, "embedding", m=16, k_codes=64, seed=3,
                     metric="cosine")
    coded = pq.pq_encode(emb, "embedding", cb)
    rows = (coded.withColumn("adc", pq.pq_adc_distance("pq_code", cb, qv))
                 .select("embedding", "adc").limit(200).collect())
    q = np.array(qv); q = q / np.linalg.norm(q)
    errs = []
    for r in rows:
        v = np.array(r.embedding, dtype=float)
        v = v / np.linalg.norm(v)
        errs.append(abs(((v - q) ** 2).sum() - r.adc))
    assert np.mean(errs) < 0.25                  # scale: d in [0, 4]


def test_pq_dim_guard(emb):
    with pytest.raises(ValueError, match="divisible"):
        pq.pq_train(emb, "embedding", m=7)


def test_ivfpq_composition(emb, spark, tmp_path):
    """IVF×PQ (the FAISS IVFPQ layout) falls out of composing the two
    tiers: PQ-encode the IVF-partitioned data, probe a centroid subset,
    ADC-score only the probed partitions' CODES, exact re-rank the
    shortlist. Full probe + full shortlist must equal exact KNN; a
    pruned probe keeps high recall while scanning a fraction of codes."""
    from pyspark.sql import functions as F

    from pydata_vector_search_spark.operators import ann

    qv = [float(x) for x in emb.orderBy("vec_id").first().embedding]
    cb = pq.pq_train(emb, "embedding", m=8, k_codes=32, seed=3,
                     metric="cosine")
    idx = ann.ivf_build(pq.pq_encode(emb, "embedding", cb), "embedding",
                        str(tmp_path / "ivfpq"), num_centroids=8,
                        seed=42, quantize=False)
    data = spark.read.parquet(idx.data_path)

    def search(nprobe, shortlist, k=10):
        import numpy as np
        C = idx.centroids / np.linalg.norm(idx.centroids, axis=1,
                                           keepdims=True)
        q = np.array(qv); q = q / np.linalg.norm(q)
        probes = list(np.argsort(-(C @ q))[:nprobe])
        pruned = data.filter(F.col("__cid").isin([int(p) for p in probes]))
        return [r.vec_id for r in pq.pq_search(
            pruned, "embedding", "pq_code", cb, qv, k=k,
            shortlist=shortlist, tiebreaker="vec_id",
            round_to=6).collect()]

    exact = [r.vec_id for r in knn.vector_search(
        emb, "embedding", qv, k=10, metric="cosine",
        tiebreaker="vec_id", round_to=6).collect()]
    assert search(nprobe=8, shortlist=emb.count()) == exact
    pruned_hits = search(nprobe=4, shortlist=128)
    assert len(set(pruned_hits) & set(exact)) >= 7


def test_pq_train_order_insensitive(emb):
    """VERDICT r05 #4: training samples by seeded content hash, not a
    row-order prefix — a sorted and a reverse-sorted corpus must yield
    IDENTICAL codebooks (no biased leading slice at 100 TB)."""
    import numpy as np
    from pyspark.sql import functions as F

    cb1 = pq.pq_train(emb.orderBy("vec_id"), "embedding",
                      m=8, k_codes=16, seed=7, metric="cosine")
    cb2 = pq.pq_train(emb.orderBy(F.col("vec_id").desc()), "embedding",
                      m=8, k_codes=16, seed=7, metric="cosine")
    assert np.array_equal(cb1.books, cb2.books)


def test_ivfpq_search_first_class(emb, spark, tmp_path):
    """ivfpq_search (the packaged IVF×PQ tier): full probe + full
    shortlist equals exact KNN; a pruned probe prunes partitions (the
    scan carries a __cid partition filter) and keeps recall."""
    from pydata_vector_search_spark.operators import ann

    qv = [float(x) for x in emb.orderBy("vec_id").first().embedding]
    cb = pq.pq_train(emb, "embedding", m=8, k_codes=32, seed=3,
                     metric="cosine")
    idx = ann.ivf_build(pq.pq_encode(emb, "embedding", cb), "embedding",
                        str(tmp_path / "ivfpq2"), num_centroids=8,
                        seed=42, quantize=False)

    exact = [r.vec_id for r in knn.vector_search(
        emb, "embedding", qv, k=10, metric="cosine",
        tiebreaker="vec_id", round_to=6).collect()]
    full = pq.ivfpq_search(spark, idx, cb, qv, k=10, nprobe=8,
                           shortlist=emb.count(), tiebreaker="vec_id",
                           round_to=6)
    assert [r.vec_id for r in full.collect()] == exact
    assert "__cid" not in full.columns

    pruned = pq.ivfpq_search(spark, idx, cb, qv, k=10, nprobe=4,
                             shortlist=128, tiebreaker="vec_id")
    hits = [r.vec_id for r in pruned.collect()]
    assert len(set(hits) & set(exact)) >= 7
