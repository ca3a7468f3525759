"""Deduplication operator family for web-text corpora (training-data
pipeline plane): exact, word-shingle Jaccard, MinHash+LSH, SimHash, and
embedding-cosine near-dup. The reference dedups entries by exact link/guid
lookup [PK]; these generalize that to content-level dedup at 100 TB scale.

Scale notes (the designs, not just the code):
- exact: one hash-shuffle on a 16-byte fingerprint — the cheapest possible
  full dedup; at 100 TB use it first to kill byte-identical copies.
- jaccard: exact verify is quadratic per candidate group — only ever run it
  AFTER a candidate generator (LSH) bounds the pair count.
- minhash_lsh: shingle→minhash happens map-side in one Arrow UDF; banding
  turns near-dup search into |bands| hash-shuffles; pair verification is
  per-bucket and skew-bounded (buckets are capped — a degenerate bucket of
  identical boilerplate would otherwise produce O(n²) pairs).
- simhash: 64-bit signature; hamming-≤k search via 4-way table split
  (pigeonhole: any pair within hamming 3 shares one exact 16-bit quarter).
- embedding: brute-force all-pairs gated to a bounded id range; the scale
  path is operators/similarity.py's LSH/IVF bucketing.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, LongType

from ..functions.textstats import fingerprint, normalize_ws

N_MINHASH = 64
N_BANDS = 16  # rows per band = 4
_MERSENNE = (1 << 61) - 1


def dedup_exact(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact content dedup: group by md5 fingerprint of normalized text,
    keep the smallest id as canonical. Returns fingerprint, n_docs, keep_id."""
    return (
        docs.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min(id_col).alias("keep_id"),
        )
    )


def word_sets(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, word) distinct pairs — the unigram-set view used by exact
    Jaccard and by MinHash shingling."""
    return docs.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.array_distinct(F.split(F.lower(normalize_ws(F.col(text_col))), " "))
        ).alias("word"),
    ).filter(F.length("word") > 0)


def jaccard_pairs(
    docs: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact word-set Jaccard over all pairs sharing ≥1 word. Output:
    id_a, id_b (a<b), jaccard (exact int counts → one double division).
    Quadratic in the worst case — gate the input (see module docstring)."""
    ws = word_sets(docs, id_col, text_col)
    sizes = ws.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    inter = (
        ws.alias("a")
        .join(ws.alias("b"), "word")
        .filter(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        .withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.col("sz_a") + F.col("sz_b") - F.col("inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


@pandas_udf(ArrayType(LongType()))
def minhash_udf(words: pd.Series) -> pd.Series:
    """N_MINHASH min-hashes per word set (Arrow-batched, numpy-vectorized).
    Universal hashing (a*x+b) mod p over murmur-free 64-bit word hashes
    derived with Python's stable hash substitute (md5-based)."""
    import hashlib

    rng = np.random.RandomState(1234)
    a = rng.randint(1, _MERSENNE, size=N_MINHASH, dtype=np.int64)
    b = rng.randint(0, _MERSENNE, size=N_MINHASH, dtype=np.int64)

    def word_hash(w: str) -> int:
        return int.from_bytes(hashlib.md5(w.encode()).digest()[:8], "little") >> 1

    out = []
    for ws in words:
        if ws is None or len(ws) == 0:
            out.append([0] * N_MINHASH)
            continue
        x = np.array([word_hash(w) for w in ws], dtype=np.int64)
        # (a ⊗ x + b) mod p, minimized over words → (N_MINHASH,)
        m = (
            (a[None, :].astype(object) * x[:, None].astype(object) + b[None, :])
            % _MERSENNE
        ).min(axis=0)
        out.append([int(v) for v in m])
    return pd.Series(out, dtype=object)


def minhash_signatures(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, sig array<long>[N_MINHASH]) via one Arrow UDF over the word set."""
    return docs.select(
        F.col(id_col).alias("id"),
        minhash_udf(
            F.array_distinct(F.split(F.lower(normalize_ws(F.col(text_col))), " "))
        ).alias("sig"),
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_bucket: int = 200,
) -> DataFrame:
    """MinHash+LSH candidate pairs verified by exact Jaccard:
    sig → N_BANDS band-hashes → explode → groupBy(band, band_hash) buckets
    → per-bucket pairs (bucket size capped: boilerplate-degenerate buckets
    are truncated rather than exploding O(n²)) → exact word-Jaccard verify.
    """
    rows_per_band = N_MINHASH // N_BANDS
    sigs = minhash_signatures(docs, id_col, text_col)
    bands = sigs.select(
        "id",
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(
                        F.slice(F.col("sig"), i * rows_per_band + 1, rows_per_band)
                    )
                    for i in range(N_BANDS)
                ]
            )
        ).alias("band", "band_hash"),
    )
    # cap pathological buckets (deterministically: keep lowest ids)
    w = F.row_number().over(
        Window.partitionBy("band", "band_hash").orderBy("id")
    )
    bands = bands.withColumn("_rn", w).filter(F.col("_rn") <= max_bucket).drop("_rn")
    cand = (
        bands.alias("x")
        .join(bands.alias("y"), ["band", "band_hash"])
        .filter(F.col("x.id") < F.col("y.id"))
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    exact = jaccard_pairs(docs, 0.0, id_col, text_col).withColumnRenamed(
        "jaccard", "jaccard_exact"
    )
    return (
        cand.join(exact, ["id_a", "id_b"], "inner")
        .filter(F.col("jaccard_exact") >= threshold)
        .select("id_a", "id_b", "jaccard_exact")
    )


@pandas_udf(LongType())
def simhash_udf(words: pd.Series) -> pd.Series:
    """64-bit SimHash over the word multiset (Arrow-batched)."""
    import hashlib

    def sim(ws) -> int:
        if ws is None or len(ws) == 0:
            return 0
        acc = np.zeros(64, dtype=np.int64)
        shifts = np.arange(64, dtype=np.uint64)
        for w in ws:
            h = np.uint64(
                int.from_bytes(hashlib.md5(w.encode()).digest()[:8], "little")
            )
            bits = ((h >> shifts) & np.uint64(1)).astype(np.int64)
            acc += np.where(bits == 1, 1, -1)
        v = 0
        for i in range(64):
            if acc[i] > 0:
                v |= 1 << i
        return v - (1 << 64) if v >= (1 << 63) else v

    return pd.Series([sim(ws) for ws in words], dtype="int64")


def simhash_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance ≤ max_hamming using the
    pigeonhole 4-quarter split: any pair within hamming ≤ 3 agrees exactly on
    at least one 16-bit quarter → 4 equi-join passes, no all-pairs scan.
    Recall is guaranteed only for max_hamming ≤ 3 (quarters - 1); larger
    thresholds are best-effort candidate generation (standard SimHash-LSH
    behavior — add block permutations for guarantees at higher radii)."""
    sigs = docs.select(
        F.col(id_col).alias("id"),
        simhash_udf(
            F.split(F.lower(normalize_ws(F.col(text_col))), " ")
        ).alias("sig"),
    )
    quarters = sigs.select(
        "id",
        "sig",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("sig"), 16 * i).bitwiseAND(F.lit(0xFFFF))
                    for i in range(4)
                ]
            )
        ).alias("q", "qval"),
    )
    cand = (
        quarters.alias("x")
        .join(quarters.alias("y"), ["q", "qval"])
        .filter(F.col("x.id") < F.col("y.id"))
        .select(
            F.col("x.id").alias("id_a"),
            F.col("y.id").alias("id_b"),
            F.col("x.sig").alias("sig_a"),
            F.col("y.sig").alias("sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def cosine_expr(a: F.Column, b: F.Column) -> F.Column:
    """Exact-order cosine of two array<float/double> columns, JVM-native:
    left-fold dot and norms via F.aggregate (deterministic summation order)."""
    def dot(x, y):
        return F.aggregate(
            F.zip_with(x, y, lambda p, q: p.cast("double") * q.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def embedding_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-dup pairs (brute force — bounded inputs only;
    the scale path is similarity.ann_lsh_topk's bucketed search)."""
    e = emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    return (
        e.alias("a")
        .join(e.alias("b"), F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(cosine_expr(F.col("a.v"), F.col("b.v")), 6).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )
