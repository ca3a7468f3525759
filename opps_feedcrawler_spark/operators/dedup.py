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
# Universal-hash modulus: Mersenne prime 2^31-1. The 64-bit word hash is
# split into two 31-bit halves and mixed with two independent coefficient
# vectors — g_i(x) = (a_i·x_lo + a2_i·x_hi + b_i) mod p — a 2-universal
# family over the full 62-bit word-hash domain (ADVICE r2: a single 31-bit
# mask collided distinct words at ~50k-vocab birthday scale, making recall
# vocabulary-dependent). Every product stays < 2^62 and the three-term sum
# < 2^63, so it is still plain int64 numpy arithmetic — no object-dtype
# big-int fallback (that was the round-1 per-row slow path).
_MERSENNE31 = (1 << 31) - 1
_MINHASH_RNG = np.random.RandomState(1234)
_MH_A = _MINHASH_RNG.randint(1, _MERSENNE31, size=N_MINHASH).astype(np.int64)
_MH_B = _MINHASH_RNG.randint(0, _MERSENNE31, size=N_MINHASH).astype(np.int64)
_MH_A2 = _MINHASH_RNG.randint(1, _MERSENNE31, size=N_MINHASH).astype(np.int64)
# 16-byte key pins pandas' SipHash so word hashes are stable across
# workers/sessions (the determinism contract of BASELINE.json:6).
_WORD_HASH_KEY = "ofs-word-hash-16"


def _hash_words_u64(flat_words: np.ndarray) -> np.ndarray:
    """Vectorized word→uint64 hash over a flat object array of strings:
    one C-speed SipHash pass (pandas hash_array, fixed key) instead of a
    per-word Python hashlib loop. `categorize=True` hashes each distinct
    word once — web text repeats words heavily."""
    if len(flat_words) == 0:
        return np.empty(0, dtype=np.uint64)
    return pd.util.hash_array(
        flat_words, hash_key=_WORD_HASH_KEY, categorize=True
    )


def _flatten_word_lists(words: pd.Series) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(flat words object array, per-doc lengths, reduceat offsets for the
    non-empty docs). Shared by the MinHash and SimHash kernels."""
    lens = np.fromiter(
        (0 if ws is None else len(ws) for ws in words), dtype=np.int64, count=len(words)
    )
    chunks = [
        np.asarray(ws, dtype=object) for ws in words if ws is not None and len(ws)
    ]
    flat = np.concatenate(chunks) if chunks else np.empty(0, dtype=object)
    nz = lens[lens > 0]
    offsets = np.r_[0, np.cumsum(nz)[:-1]].astype(np.int64)
    return flat, lens, offsets


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


def jaccard_for_pairs(
    docs: DataFrame | None,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    words_arr: DataFrame | None = None,
) -> DataFrame:
    """Exact word-set Jaccard computed ONLY for the given (id_a, id_b)
    candidate pairs: join each pair to its two (id, words) arrays and
    intersect JVM-side (array_intersect is a per-row hash-set pass —
    O(|wa| + |wb|) per candidate pair, whole-stage codegen, and the only
    shuffles are the two id-keyed joins; AQE broadcasts the small pair
    side). This replaced an exploded (id, word)-row formulation whose
    semi-join/size/intersect-groupBy chain cost ~6 shuffle stages —
    per-pair array intersection moves less data at every scale because
    word rows never shuffle, and the pair count is candidate-gated by
    construction. EVERY requested pair comes back exactly once: pairs
    sharing no words — including pairs whose endpoint has an empty or
    missing word set — get jaccard 0 (left joins + zero-denominator
    guard). Output: id_a, id_b, jaccard.

    Pass `words_arr` (an (id, words array<string>) DataFrame) to reuse an
    already-materialized word view instead of re-deriving it from `docs`
    — minhash_lsh_pairs does this so the text normalize/split runs once
    for signatures AND verify (the round-2 toy-scale regression)."""
    if words_arr is None:
        words_arr = docs.select(
            F.col(id_col).alias("id"),
            F.array_distinct(
                F.split(F.lower(normalize_ws(F.col(text_col))), " ")
            ).alias("words"),
        )
    wa = words_arr.select(
        "id",
        F.array_remove(
            F.expr("coalesce(words, cast(array() as array<string>))"), ""
        ).alias("w"),
    )
    joined = (
        pairs.join(
            wa.select(F.col("id").alias("id_a"), F.col("w").alias("wa")),
            "id_a",
            "left",
        )
        .join(
            wa.select(F.col("id").alias("id_b"), F.col("w").alias("wb")),
            "id_b",
            "left",
        )
        .withColumn("wa", F.expr("coalesce(wa, cast(array() as array<string>))"))
        .withColumn("wb", F.expr("coalesce(wb, cast(array() as array<string>))"))
    )
    inter_c = F.size(F.array_intersect("wa", "wb"))
    denom = F.size("wa") + F.size("wb") - inter_c
    return joined.withColumn(
        "jaccard",
        F.when(
            denom > 0, inter_c.cast("double") / denom.cast("double")
        ).otherwise(F.lit(0.0)),
    ).select("id_a", "id_b", "jaccard")


@pandas_udf(ArrayType(LongType()))
def minhash_udf(words: pd.Series) -> pd.Series:
    """N_MINHASH min-hashes per word set — fully vectorized per Arrow
    batch, no per-word Python: flatten the batch's word lists, one C-speed
    hash pass over all words, then for each of the N_MINHASH universal
    hashes one (a*x+b) mod p pass plus a per-doc segment-min via
    np.minimum.reduceat. Peak temp memory is O(total words), not
    O(words × N_MINHASH). Empty/null word sets → the all-zero signature."""
    flat, lens, offsets = _flatten_word_lists(words)
    full = np.zeros((len(words), N_MINHASH), dtype=np.int64)
    if len(flat):
        h = _hash_words_u64(flat)
        x_lo = (h & np.uint64(0x7FFFFFFF)).astype(np.int64)
        x_hi = ((h >> np.uint64(31)) & np.uint64(0x7FFFFFFF)).astype(np.int64)
        mins = np.empty((len(offsets), N_MINHASH), dtype=np.int64)
        for i in range(N_MINHASH):
            mins[:, i] = np.minimum.reduceat(
                (x_lo * _MH_A[i] + x_hi * _MH_A2[i] + _MH_B[i]) % _MERSENNE31,
                offsets,
            )
        full[lens > 0] = mins
    return pd.Series(full.tolist())


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
    from pyspark.storagelevel import StorageLevel

    rows_per_band = N_MINHASH // N_BANDS
    # ONE materialization of the normalized word arrays feeds BOTH the
    # signature UDF and the exact-Jaccard verify (its word_sets view is a
    # plain explode of the same arrays) — without the persist, Spark
    # recomputes the normalize/split projection per consuming subtree
    # (no common-subexpression reuse across plan branches), which doubled
    # the dominant cost at toy scale (round-2 bench regression). The
    # cached view is (id, words) only — tiny next to the documents scan —
    # and the caller may drop it early via the `.ofs_unpersist` attribute
    # on the result (otherwise Spark's LRU block eviction reclaims it).
    words_arr = docs.select(
        F.col(id_col).alias("id"),
        F.array_distinct(
            F.split(F.lower(normalize_ws(F.col(text_col))), " ")
        ).alias("words"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    sigs = words_arr.select("id", minhash_udf("words").alias("sig"))
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
    # pair expansion: collect the (capped, ≤max_bucket) bucket membership
    # and emit id<id pairs JVM-side with array HOFs — the groupBy reuses
    # the window's (band, band_hash) hash partitioning (no new exchange),
    # and this replaces the earlier bucket self-join, which recomputed the
    # whole sig→band subtree once per join side and cost two more
    # exchanges. collect_list is safe ONLY because the cap runs first.
    buckets = bands.groupBy("band", "band_hash").agg(
        F.sort_array(F.collect_list("id")).alias("ids")
    )
    cand = (
        buckets.select(
            F.explode(
                F.expr(
                    "flatten(transform(ids, (a, i) -> "
                    "transform(slice(ids, i + 2, size(ids)), "
                    "b -> struct(a as id_a, b as id_b))))"
                )
            ).alias("p")
        )
        .select("p.id_a", "p.id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    # Verify is CANDIDATE-GATED: exact Jaccard is computed only for the
    # LSH candidate pairs, never all-pairs — the pair count (and so the
    # verify cost) stays bounded by the banding + bucket cap above, and
    # the verify joins read the SAME cached word arrays the signatures
    # used (per-pair array_intersect, no word-row shuffle).
    out = (
        jaccard_for_pairs(None, cand, id_col, text_col, words_arr=words_arr)
        .withColumnRenamed("jaccard", "jaccard_exact")
        .filter(F.col("jaccard_exact") >= threshold)
        .select("id_a", "id_b", "jaccard_exact")
    )
    out.ofs_unpersist = lambda: words_arr.unpersist()
    return out


@pandas_udf(LongType())
def simhash_udf(words: pd.Series) -> pd.Series:
    """64-bit SimHash over the word multiset — vectorized per Arrow batch:
    one C-speed hash pass over the flattened words, then per bit position a
    ±1 contribution pass with per-doc segment-sum via np.add.reduceat.
    Empty/null word sets → 0."""
    flat, lens, offsets = _flatten_word_lists(words)
    out = np.zeros(len(words), dtype=np.uint64)
    if len(flat):
        h = _hash_words_u64(flat)
        acc = np.zeros(len(offsets), dtype=np.uint64)
        for i in range(64):
            bit = ((h >> np.uint64(i)) & np.uint64(1)).astype(np.int32)
            s = np.add.reduceat(2 * bit - 1, offsets)
            acc |= (s > 0).astype(np.uint64) << np.uint64(i)
        out[lens > 0] = acc
    return pd.Series(out.view(np.int64), dtype="int64")


def simhash_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_bucket: int = 200,
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance ≤ max_hamming using the
    pigeonhole 4-quarter split: any pair within hamming ≤ 3 agrees exactly on
    at least one 16-bit quarter → 4 equi-join passes, no all-pairs scan.
    Recall is guaranteed only for max_hamming ≤ 3 (quarters - 1); larger
    thresholds are best-effort candidate generation (standard SimHash-LSH
    behavior — add block permutations for guarantees at higher radii).

    Degenerate (q, qval) buckets are capped at max_bucket rows
    (deterministically, lowest ids kept) — the same guard the MinHash
    banding applies: a web corpus's boilerplate/empty documents collapse
    onto few signatures (every empty doc has sig 0), and an uncapped
    bucket would pair them O(n²)."""
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
    wq = F.row_number().over(Window.partitionBy("q", "qval").orderBy("id"))
    quarters = (
        quarters.withColumn("_rn", wq).filter(F.col("_rn") <= max_bucket).drop("_rn")
    )
    # capped-bucket pair expansion JVM-side (see minhash_lsh_pairs: the
    # groupBy reuses the window's partitioning and replaces the bucket
    # self-join's double subtree recompute; safe because the cap bounds
    # every collected bucket at max_bucket members)
    buckets = quarters.groupBy("q", "qval").agg(
        F.sort_array(F.collect_list(F.struct("id", "sig"))).alias("m")
    )
    cand = (
        buckets.select(
            F.explode(
                F.expr(
                    "flatten(transform(m, (a, i) -> "
                    "transform(slice(m, i + 2, size(m)), "
                    "b -> struct(a.id as id_a, b.id as id_b, "
                    "a.sig as sig_a, b.sig as sig_b))))"
                )
            ).alias("p")
        )
        .select("p.id_a", "p.id_b", "p.sig_a", "p.sig_b")
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


def word_shingles(
    docs: DataFrame,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Distinct word n-gram shingles per document: (id, shingle string).

    Whitespace-tokenized, lowercased — the normalization benchmark-
    decontamination pipelines use (GPT-3 appendix C / Dodge et al. 2021
    use 8-13-gram overlap after light normalization; the n is a knob).
    Pure JVM: split + a transform() over token offsets + explode, so
    shingling stays inside whole-stage codegen — no Python in the path
    of every token of a 100 TB corpus.
    """
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    # slide a window of n over the token array via transform on indices
    shingles = F.expr(
        f"transform(sequence(1, greatest(size({'__toks'}), {n}) - {n} + 1), "
        f"i -> concat_ws(' ', slice(__toks, i, {n})))"
    )
    return (
        docs.select(F.col(id_col).alias("id"), toks.alias("__toks"))
        .filter(F.size("__toks") >= n)
        .select("id", F.explode(shingles).alias("shingle"))
        .distinct()
    )


def contamination_flags(
    train: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing any
    word n-gram with any benchmark document. Returns
    (id, n_overlap_shingles) for contaminated train docs only — the
    caller anti-joins this against the corpus to drop or audit them.

    Scale design: both sides reduce to DISTINCT (id, shingle) pairs; the
    benchmark side (eval sets are tiny — thousands of docs vs billions)
    collapses further to a DISTINCT shingle column that AQE broadcasts,
    so the corpus-side cost is one map-side semi-ish hash join plus a
    groupBy(id) count with partial aggregation. No all-pairs product
    anywhere; corpus shingles stream through without materializing.
    """
    t = word_shingles(train, n, id_col, text_col)
    b = word_shingles(benchmark, n, id_col, text_col).select(
        "shingle"
    ).distinct()
    return (
        t.join(b, "shingle")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_overlap_shingles"))
    )


def dup_spans(
    docs: DataFrame,
    span_len: int = 40,
    stride: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Cross-document duplicated char-span detection — the fingerprint
    approximation of ExactSubstr dedup (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better": exact suffix-array
    substring dedup; the stride-sampled fixed-length variant is the
    standard distributed stand-in). Every `stride` chars each doc emits a
    `span_len`-char window; a span appearing in ≥2 DISTINCT docs marks
    every occurrence position as duplicated. Returns
    (id, n_dup_spans) for affected docs — callers cut or down-weight the
    spans (memorization control), unlike doc-level MinHash which can only
    drop whole documents.

    Scale design: window emission is whole-stage codegen
    (sequence+substring HOFs, ~len/stride rows per doc, no Python); the
    dup set is one partial-aggregated groupBy(span) — at production scale
    you'd group on xxhash64(span) to shuffle 8 bytes instead of 40 chars
    (collision-safe to verify after) — then one hash join back. No
    pairwise product anywhere.
    """
    t = F.lower(F.col(text_col))
    spans_expr = F.expr(
        f"transform(sequence(1, length(__t) - {span_len - 1}, {stride}), "
        f"i -> substring(__t, i, {span_len}))"
    )
    s = (
        docs.select(F.col(id_col).alias("id"), t.alias("__t"))
        .filter(F.length("__t") >= span_len)
        .select("id", F.explode(spans_expr).alias("span"))
    )
    dup = (
        s.groupBy("span")
        .agg(F.countDistinct("id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("span")
    )
    return s.join(dup, "span").groupBy("id").agg(
        F.count(F.lit(1)).alias("n_dup_spans")
    )


def mirror_host_pairs(
    pages: DataFrame,
    min_shared: int = 2,
    max_hosts_per_fp: int = 50,
    host_col: str = "host",
    text_col: str = "text",
) -> DataFrame:
    """Mirror-site detection: host pairs sharing ≥min_shared identical
    content fingerprints. Mirrors (same corpus served under two domains)
    waste crawl budget and duplicate training text at whole-site scale —
    catching them at the HOST level lets the scheduler drop one side
    instead of deduping page by page after fetching both.

    Scale design: pages collapse to DISTINCT (host, md5) first;
    fingerprints on more than `max_hosts_per_fp` hosts are dropped BEFORE
    pairing (empty pages / boilerplate shells would otherwise pair every
    host with every host — the classic quadratic blowup; real mirrors
    share many fps, so capping host-degree per fp costs no recall on
    min_shared). The pair generation is a self-equi-join on fp whose
    per-key fan-out is thereby bounded at max_hosts_per_fp².
    """
    fp = pages.select(
        F.col(host_col).alias("host"), F.md5(F.col(text_col)).alias("fp")
    ).distinct()
    keep = (
        fp.groupBy("fp")
        .agg(F.countDistinct("host").alias("nh"))
        .filter((F.col("nh") >= 2) & (F.col("nh") <= max_hosts_per_fp))
        .select("fp")
    )
    f2 = fp.join(keep, "fp")
    a, b = f2.alias("a"), f2.alias("b")
    pairs = a.join(b, "fp").filter(F.col("a.host") < F.col("b.host"))
    return (
        pairs.select(
            F.col("a.host").alias("host_a"), F.col("b.host").alias("host_b")
        )
        .groupBy("host_a", "host_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
