"""Seeded synthetic embedding corpus for ANN benchmarking at scale
(VERDICT r2 #6: prove the LSH/IVF paths beyond toy row counts).

Generation is fully deterministic and DISTRIBUTED: vectors are a pure
function of (seed, vec_id) — cluster centers come from a seeded driver-side
RNG (tiny: n_clusters x dim), per-row noise from a vectorized splitmix64
hash of (vec_id, coordinate) — so any partitioning of spark.range(n)
produces identical bytes, the generator never materializes the corpus on
the driver, and re-runs hit the parquet cache. Clustered geometry (tight
Gaussian-ish blobs around random unit centers) is the regime ANN indexes
are built for and makes recall@k a meaningful signal; pure-uniform vectors
would make every method look equally bad.

No external data: everything derives from the seed (task brief: synthesize
deterministically at small scale; same generator scales to any n).
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

DEFAULT_DIM = 32
DEFAULT_CLUSTERS = 1024
_SEED = 20240611


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain PRNG mix): uint64 in,
    uint64 out; used as a counter-based per-(row, coord) noise source so
    generation is order- and partition-independent."""
    x = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    x ^= x >> np.uint64(30)
    x = (x * np.uint64(0xBF58476D1CE4E5B9)).astype(np.uint64)
    x ^= x >> np.uint64(27)
    x = (x * np.uint64(0x94D049BB133111EB)).astype(np.uint64)
    x ^= x >> np.uint64(31)
    return x


def _noise(ids: np.ndarray, dim: int, channel: int) -> np.ndarray:
    """(len(ids), dim) deterministic noise in [-0.5, 0.5): splitmix64 over
    the (id, coord, channel) counter grid, scaled from the top 53 bits."""
    base = (
        ids.astype(np.uint64)[:, None] * np.uint64(dim * 4)
        + np.arange(dim, dtype=np.uint64)[None, :] * np.uint64(4)
        + np.uint64(channel)
    )
    u = _splitmix64(base + np.uint64(_SEED))
    return (u >> np.uint64(11)).astype(np.float64) / float(1 << 53) - 0.5


def _centers(n_clusters: int, dim: int) -> np.ndarray:
    rng = np.random.RandomState(_SEED)
    c = rng.standard_normal((n_clusters, dim))
    return c / np.linalg.norm(c, axis=1, keepdims=True)


def vectors_for_ids(
    ids: np.ndarray,
    dim: int = DEFAULT_DIM,
    n_clusters: int = DEFAULT_CLUSTERS,
    noise_scale: float = 0.15,
    channel: int = 0,
) -> np.ndarray:
    """The generative formula, shared by the distributed generator and any
    driver-side checker: unit cluster center (id % n_clusters) + bounded
    hash noise. `channel` separates corpus vectors (0) from query
    perturbations (1) of the same id."""
    centers = _centers(n_clusters, dim)
    return centers[ids % n_clusters] + noise_scale * _noise(ids, dim, channel)


def corpus_path(n: int, dim: int) -> str:
    return os.path.join(tempfile.gettempdir(), f"ofs-ann-corpus-{n}x{dim}-v1.parquet")


def ensure_ann_corpus(
    spark: SparkSession,
    n: int,
    dim: int = DEFAULT_DIM,
    n_clusters: int = DEFAULT_CLUSTERS,
) -> str:
    """Write (vec_id long, embedding array<double>) for ids 0..n-1 if the
    cache is absent; return the parquet path. Distributed mapInPandas over
    spark.range — no driver materialization at any n."""
    path = corpus_path(n, dim)
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return path

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            mat = vectors_for_ids(ids, dim, n_clusters)
            yield pd.DataFrame(
                {"vec_id": ids, "embedding": list(mat)}
            )

    (
        spark.range(n)
        .repartition(max(32, n // 250_000))
        .mapInPandas(gen, "vec_id long, embedding array<double>")
        .write.mode("overwrite")
        .parquet(path)
    )
    return path


def ann_queries(
    spark: SparkSession,
    n_corpus: int,
    n_queries: int,
    dim: int = DEFAULT_DIM,
    n_clusters: int = DEFAULT_CLUSTERS,
) -> DataFrame:
    """n_queries probe vectors: evenly-strided corpus ids, re-generated with
    the query noise channel — each query is a near-duplicate of its source
    row (same cluster, different noise), the classic recall probe. Query
    ids reuse the source vec_id, so self-matches are excluded by the ANN
    operators' query_id != neighbor_id guard and ground truth ranks true
    neighbors only."""
    stride = max(1, n_corpus // n_queries)
    ids = np.arange(n_queries, dtype=np.int64) * stride
    mat = vectors_for_ids(ids, dim, n_clusters, channel=1)
    return spark.createDataFrame(
        [(int(i), [float(x) for x in row]) for i, row in zip(ids, mat)],
        "vec_id long, embedding array<double>",
    )


def ground_truth_topk(
    corpus_parquet: str,
    queries: pd.DataFrame,
    k: int,
) -> dict[int, list[int]]:
    """Exact cosine top-k per query, computed driver-side in one blocked
    numpy pass over the parquet (row-group streaming — the full corpus
    matrix is never resident). This is the oracle the distributed paths are
    scored against; it shares no code with them. Returns
    {query_id: [neighbor_id ranked]}. Excludes neighbor_id == query_id."""
    import pyarrow.dataset as ds

    qids = queries["vec_id"].to_numpy()
    qm = np.vstack(queries["embedding"].to_numpy())
    qm = qm / np.linalg.norm(qm, axis=1, keepdims=True)
    best_scores = np.full((len(qids), k), -np.inf)
    best_ids = np.full((len(qids), k), -1, dtype=np.int64)

    for batch in ds.dataset(corpus_parquet, format="parquet").to_batches(
        columns=["vec_id", "embedding"], batch_size=131_072
    ):
        ids = batch.column("vec_id").to_numpy()
        mat = np.vstack(batch.column("embedding").to_pylist())
        mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        sims = qm @ mat.T  # (q, b)
        sims[ids[None, :] == qids[:, None]] = -np.inf  # exclude self
        # merge this block's top-k into the running top-k
        take = min(k, sims.shape[1])
        part = np.argpartition(-sims, take - 1, axis=1)[:, :take]
        cand_scores = np.concatenate(
            [best_scores, np.take_along_axis(sims, part, axis=1)], axis=1
        )
        cand_ids = np.concatenate([best_ids, ids[part]], axis=1)
        order = np.argsort(-cand_scores, axis=1, kind="stable")[:, :k]
        best_scores = np.take_along_axis(cand_scores, order, axis=1)
        best_ids = np.take_along_axis(cand_ids, order, axis=1)
    return {int(q): [int(i) for i in row if i >= 0] for q, row in zip(qids, best_ids)}


def recall_at_k(
    approx: pd.DataFrame, truth: dict[int, list[int]], k: int
) -> float:
    """Mean over queries of |approx top-k ∩ true top-k| / k."""
    got: dict[int, set] = {}
    for q, n in zip(approx["query_id"], approx["neighbor_id"]):
        got.setdefault(int(q), set()).add(int(n))
    if not truth:
        return 0.0
    return float(
        np.mean(
            [len(got.get(q, set()) & set(t[:k])) / max(1, len(t[:k]))
             for q, t in truth.items()]
        )
    )
