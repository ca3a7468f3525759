"""Similarity search over embedding columns (training-data pipeline plane):
brute-force cosine top-k as the correctness baseline, random-hyperplane-LSH
bucketed top-k as the scale path.

Scale design: brute force is O(|Q|·|N|) — fine when the query side is small
enough to broadcast (the plan below broadcasts it explicitly). The LSH
variant shuffles both sides by bucket signature, so the per-task work is
|Q_b|·|N_b| per bucket; multi-probe (flipping one bit) bounds recall loss.
At 100 TB you tune n_planes so buckets fit an executor's batch and add an
IVF-style coarse quantizer in front; the dataflow shape stays identical.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, IntegerType

from .dedup import cosine_expr

N_PLANES = 8
_PLANE_SEED = 20240301


def _planes(dim: int) -> np.ndarray:
    rng = np.random.RandomState(_PLANE_SEED)
    return rng.standard_normal((N_PLANES, dim))


@pandas_udf(IntegerType())
def lsh_bucket_udf(vecs: pd.Series) -> pd.Series:
    """Random-hyperplane signature → int bucket (Arrow-batched numpy matmul)."""
    if len(vecs) == 0:
        return pd.Series([], dtype="int32")
    mat = np.vstack([np.asarray(v, dtype=np.float64) for v in vecs])
    planes = _planes(mat.shape[1])
    bits = (mat @ planes.T) > 0
    weights = (1 << np.arange(N_PLANES)).astype(np.int32)
    return pd.Series((bits @ weights).astype(np.int32))


def ann_bruteforce_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: broadcast the (small) query side across the
    corpus, JVM-native dot products, two-key deterministic ranking.
    Output: query_id, neighbor_id, rank, cos (rounded 6)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nv")
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_expr(F.col("qv"), F.col("nv")), 6).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


_KMEANS_SEED = 20240517
KMEANS_SAMPLE = 4096
KMEANS_ITERS = 10


def kmeans_centroids(
    corpus: DataFrame,
    n_cells: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_size: int = KMEANS_SAMPLE,
    iters: int = KMEANS_ITERS,
) -> DataFrame:
    """Spherical k-means centroids for the IVF coarse quantizer,
    deterministic end to end: the training sample is the `sample_size`
    vectors with the lowest xxhash64(id) (a seedless, order-independent
    pseudo-random draw), Lloyd runs driver-side in numpy (sample is tiny —
    at 100 TB you still train the coarse quantizer on a bounded sample;
    assignment of the full corpus stays distributed in ann_ivf_topk), and
    init is seeded. Empty clusters keep their previous centroid. Output:
    (cell int, cv array<double>) with unit-norm centroids."""
    # xxhash64 takes the id column as-is (any type): casting to long first
    # made every non-numeric id NULL, silently degrading the draw to
    # lowest-id order — the exact bias this sampler replaced (ADVICE r2)
    sample = (
        corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
        .orderBy(F.xxhash64(F.col("id")).asc(), F.col("id").asc())
        .limit(sample_size)
        .collect()
    )
    spark = corpus.sparkSession
    mat = np.array([list(r.v) for r in sample], dtype=np.float64)
    if mat.ndim != 2 or len(mat) == 0:
        # empty corpus: no centroids → callers produce empty results, the
        # same graceful degradation the lowest-id picker had
        return spark.createDataFrame([], "cell int, cv array<double>")
    norms = np.linalg.norm(mat, axis=1)
    mat = mat[norms > 0] / norms[norms > 0, None]
    if len(mat) == 0:  # only zero-norm vectors: cosine is undefined
        return spark.createDataFrame([], "cell int, cv array<double>")
    n_cells = min(n_cells, len(mat))
    rng = np.random.RandomState(_KMEANS_SEED)
    cents = mat[rng.choice(len(mat), size=n_cells, replace=False)]
    for _ in range(iters):
        sims = mat @ cents.T  # (n, k) cosine (all unit-norm)
        assign = sims.argmax(axis=1)
        for c in range(n_cells):
            members = mat[assign == c]
            if len(members):
                m = members.mean(axis=0)
                nrm = np.linalg.norm(m)
                if nrm > 0:
                    cents[c] = m / nrm
    return spark.createDataFrame(
        [(int(i), [float(x) for x in cents[i]]) for i in range(n_cells)],
        "cell int, cv array<double>",
    )


def _cell_topn_udf(cents_mat: np.ndarray, cell_ids: np.ndarray, n: int):
    """pandas_udf: embedding -> the `n` nearest cell ids (cosine, ties by
    centroid order = cell asc). The centroid matrix rides the UDF closure
    (n_cells × dim floats — KBs), so assignment is a map-side vectorized
    matmul with NO row explosion and NO shuffle: the previous
    join-all-centroids + window formulation materialized |side| × n_cells
    rows and cost MORE than brute force at 1M × 256 (measured,
    BENCH/ann_r3.json predecessor run: ivf 244 s vs brute 134 s)."""
    cm = cents_mat / np.linalg.norm(cents_mat, axis=1, keepdims=True)

    @pandas_udf(ArrayType(IntegerType()))
    def topn(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        mat = np.vstack([np.asarray(v, dtype=np.float64) for v in vecs])
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        sims = np.round((mat / norms) @ cm.T, 6)
        take = min(n, sims.shape[1])
        # stable argsort on -sims: ties break by centroid position, which
        # _collect_centroids orders cell-asc — same tie rule the old
        # window (ccos desc, cell asc) used
        order = np.argsort(-sims, axis=1, kind="stable")[:, :take]
        return pd.Series(list(cell_ids[order]))

    return topn


def _collect_centroids(cents: DataFrame) -> tuple[np.ndarray, np.ndarray]:
    """(cell_ids, matrix) in cell-asc order; bounded collect (n_cells rows)."""
    rows = cents.orderBy(F.col("cell").asc()).collect()
    if not rows:
        return np.array([], dtype=np.int32), np.zeros((0, 1))
    return (
        np.array([r.cell for r in rows], dtype=np.int32),
        np.array([list(r.cv) for r in rows], dtype=np.float64),
    )


def ivf_assign(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Build the inverted file: (cell, neighbor_id, nv) — each corpus vector
    tagged with its nearest centroid via the map-side argmax UDF. In
    production this is a materialized index table, built once per corpus
    snapshot and reused across query batches (bench times it as build cost,
    not query cost)."""
    cell_ids, cents_mat = _collect_centroids(centroids)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nv")
    )
    if len(cell_ids) == 0:
        return c.withColumn("cell", F.lit(None).cast("int")).filter(
            F.col("cell").isNotNull()
        )
    return c.withColumn(
        "cell", _cell_topn_udf(cents_mat, cell_ids, 1)(F.col("nv"))[0]
    )


def ann_ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 3,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
    assigned: DataFrame | None = None,
) -> DataFrame:
    """IVF-style coarse-quantized ANN: the scale path for big corpora.

    1. Centroids = seeded spherical k-means over a bounded hash-drawn
       sample (kmeans_centroids above); callers may pass precomputed
       `centroids` (cell, cv) to amortize training across queries.
    2. Assign every corpus vector to its nearest centroid — map-side
       vectorized argmax over the closure-shipped centroid matrix
       (`ivf_assign`); callers may pass the materialized `assigned`
       inverted file to amortize the build across query batches.
    3. Queries probe their n_probe nearest cells; candidates are only the
       vectors in probed cells; exact cosine re-rank within them.

    Per-task work drops from |Q|·|N| to |Q|·|N|·(n_probe/n_cells) and the
    candidate join is a plain equi-join on cell — shuffle-partitionable at
    any corpus size. Same output schema as the brute-force baseline so
    recall is directly measurable (tests assert recall@k)."""
    cents = (
        centroids
        if centroids is not None
        else kmeans_centroids(corpus, n_cells, id_col, vec_col)
    )
    cell_ids, cents_mat = _collect_centroids(cents)
    if assigned is None:
        assigned = ivf_assign(corpus, cents, id_col, vec_col)
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    if len(cell_ids) == 0:
        probes = q.withColumn("cell", F.lit(None).cast("int")).filter(
            F.col("cell").isNotNull()
        )
    else:
        probes = q.withColumn(
            "cells",
            _cell_topn_udf(cents_mat, cell_ids, n_probe)(F.col("qv")),
        ).select("query_id", "qv", F.explode("cells").alias("cell"))
    candidates = assigned.join(probes, "cell").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    scored = candidates.select(
        "query_id",
        "neighbor_id",
        F.round(cosine_expr(F.col("qv"), F.col("nv")), 6).alias("cos"),
    ).dropDuplicates(["query_id", "neighbor_id"])
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    out = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )
    # candidate stage exposed for probe-cost instrumentation (bench):
    # count() of this DF = exact cosine evaluations the index admitted
    out.ofs_candidates = candidates  # type: ignore[attr-defined]
    return out


def ann_lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: equi-join on LSH bucket (with 1-bit multi-probe on
    the query side), exact cosine re-rank within buckets. Same output schema
    as the brute-force baseline so recall is directly measurable."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("nv"),
        lsh_bucket_udf(F.col(vec_col)).alias("bucket"),
    )
    q0 = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        lsh_bucket_udf(F.col(vec_col)).alias("bucket"),
    )
    # multi-probe: original bucket + each 1-bit flip
    probes = q0.select(
        "query_id",
        "qv",
        F.explode(
            F.array(
                F.col("bucket"),
                *[
                    F.col("bucket").bitwiseXOR(F.lit(1 << i))
                    for i in range(N_PLANES)
                ],
            )
        ).alias("bucket"),
    )
    candidates = c.join(probes, "bucket").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    scored = candidates.select(
        "query_id",
        "neighbor_id",
        F.round(cosine_expr(F.col("qv"), F.col("nv")), 6).alias("cos"),
    ).dropDuplicates(["query_id", "neighbor_id"])
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id").asc()
    )
    out = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )
    out.ofs_candidates = candidates  # type: ignore[attr-defined]  # see ivf
    return out
