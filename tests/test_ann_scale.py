"""ANN scale-bench harness correctness at toy size (the 1M-vector run is
bench.py --ann-only): generator determinism/partition-independence, the
driver-side blocked-numpy ground truth against a transparent O(n^2) check,
and recall wiring end-to-end through the real LSH/IVF operators."""

from __future__ import annotations

import numpy as np
import pytest

from opps_feedcrawler_spark.sources.ann_synth import (
    ann_queries,
    ensure_ann_corpus,
    ground_truth_topk,
    recall_at_k,
    vectors_for_ids,
)

N = 3000
DIM = 16


@pytest.fixture(scope="module")
def corpus_path(spark, tmp_path_factory):
    import opps_feedcrawler_spark.sources.ann_synth as mod

    base = tmp_path_factory.mktemp("ann")
    orig = mod.corpus_path
    mod.corpus_path = lambda n, dim: str(base / f"c-{n}x{dim}.parquet")
    try:
        yield ensure_ann_corpus(spark, N, DIM, n_clusters=64)
    finally:
        mod.corpus_path = orig


def test_generator_deterministic_and_partition_independent(spark, corpus_path):
    df = spark.read.parquet(corpus_path)
    assert df.count() == N
    got = {r.vec_id: np.array(r.embedding) for r in df.collect()}
    # formula reproduction for arbitrary ids, independent of partitioning
    ids = np.array([0, 1, 17, 999, N - 1])
    want = vectors_for_ids(ids, DIM, 64)
    for i, vid in enumerate(ids):
        assert np.allclose(got[vid], want[i]), vid
    # query channel differs from corpus channel but stays near its source
    qv = vectors_for_ids(ids, DIM, 64, channel=1)
    assert not np.allclose(qv, want)
    cos = np.sum(qv * want, axis=1) / (
        np.linalg.norm(qv, axis=1) * np.linalg.norm(want, axis=1)
    )
    assert (cos > 0.9).all()  # near-duplicate of its source row


def test_ground_truth_matches_naive_n2(spark, corpus_path):
    queries = ann_queries(spark, N, 8, DIM, n_clusters=64).toPandas()
    truth = ground_truth_topk(corpus_path, queries, k=5)
    # transparent O(n^2): full matrix in memory at toy size
    full = spark.read.parquet(corpus_path).toPandas()
    mat = np.vstack(full["embedding"].to_numpy())
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    ids = full["vec_id"].to_numpy()
    for _, qrow in queries.iterrows():
        qv = np.asarray(qrow["embedding"])
        qv = qv / np.linalg.norm(qv)
        sims = mat @ qv
        sims[ids == qrow["vec_id"]] = -np.inf
        order = ids[np.argsort(-sims, kind="stable")][:5]
        assert truth[int(qrow["vec_id"])] == [int(x) for x in order]


def test_recall_wiring_through_real_operators(spark, corpus_path):
    from opps_feedcrawler_spark.operators.similarity import (
        ann_bruteforce_topk,
        ann_ivf_topk,
        ann_lsh_topk,
    )

    corpus = spark.read.parquet(corpus_path)
    queries = ann_queries(spark, N, 10, DIM, n_clusters=64)
    truth = ground_truth_topk(corpus_path, queries.toPandas(), k=5)
    brute = ann_bruteforce_topk(queries, corpus, k=5).toPandas()
    # the distributed exact path must agree with the independent oracle
    assert recall_at_k(brute, truth, 5) == 1.0
    lsh = ann_lsh_topk(queries, corpus, k=5)
    ivf = ann_ivf_topk(corpus=corpus, queries=queries, k=5, n_cells=16, n_probe=4)
    r_lsh = recall_at_k(lsh.toPandas(), truth, 5)
    r_ivf = recall_at_k(ivf.toPandas(), truth, 5)
    # clustered near-dup probes: approximate paths must beat a floor
    assert r_lsh >= 0.5, r_lsh
    assert r_ivf >= 0.5, r_ivf
    # candidate instrumentation: admitted pairs strictly below brute's q*(n-1)
    assert lsh.ofs_candidates.count() < 10 * (N - 1)
    assert ivf.ofs_candidates.count() < 10 * (N - 1)
