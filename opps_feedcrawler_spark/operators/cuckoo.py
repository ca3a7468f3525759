"""Distributed cuckoo URL-seen filter — the "/cuckoo" half of the north
star's "distributed bloom/cuckoo URL-seen filter built via vectorized Arrow
UDFs" (BASELINE.json:6). Same operator contract as operators/seen.py's
bloom (a work-skipping pre-filter with NO false negatives; membership truth
stays the exact anti-join), plus the cuckoo-specific capability the bloom
lacks: DELETION (a crawl that un-sees URLs — e.g. recrawl-after-TTL —
can remove fingerprints without rebuilding).

Design (Fan et al., "Cuckoo Filter: Practically Better Than Bloom",
CoNEXT'14 — public paper; see PAPERS.md):
- url_hash space is partitioned into NBUCKETS_CK table shards
  (shard = pmod(url_hash, NBUCKETS_CK)), one row per shard:
  (bucket int, table binary) — a (NSLOTS x SLOTS_PER_BUCKET) uint16
  fingerprint array, 0 = empty.
- fingerprint fp = 16-bit nonzero mix of url_hash; candidate slots
  i1 = H(url_hash) mod NSLOTS, i2 = i1 XOR H2(fp) mod NSLOTS (partial-key
  cuckooing, so displacement needs only the stored fp).
- insert: vectorized first-try placement into i1/i2; the (rare) leftovers
  run the classic per-item eviction loop inside the same Arrow batch.
- probe: vectorized membership test of fp in slots i1 ∪ i2 — no false
  negatives for inserted keys (eviction preserves membership; a full table
  falls back to marking the item maybe_seen=True, staying conservative).

Scale: identical dataflow shape to the bloom — build/merge/delete are
grouped-map Arrow UDFs per shard, probe is a cogrouped join or (small
tables) a broadcast; shards spread over the cluster, numpy inside.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NBUCKETS_CK = 64  # table shards (pmod of url_hash)
NSLOTS = 1 << 12  # cuckoo buckets per shard
SLOTS_PER_BUCKET = 4
MAX_KICKS = 250


def _fingerprint(h: np.ndarray) -> np.ndarray:
    """16-bit nonzero fingerprint from the 64-bit url_hash."""
    x = h.astype(np.uint64)
    x ^= x >> np.uint64(33)
    x *= np.uint64(0xFF51AFD7ED558CCD)
    x ^= x >> np.uint64(33)
    fp = (x & np.uint64(0xFFFF)).astype(np.uint16)
    return np.where(fp == 0, np.uint16(1), fp)


def _index1(h: np.ndarray) -> np.ndarray:
    x = h.astype(np.uint64)
    x *= np.uint64(0xC2B2AE3D27D4EB4F)
    x ^= x >> np.uint64(29)
    return (x % np.uint64(NSLOTS)).astype(np.int64)


def _alt_index(i: np.ndarray, fp: np.ndarray) -> np.ndarray:
    """Partial-key alternate index: i XOR (hash(fp) masked to the index
    width). Masking (NOT modulo) keeps the XOR an involution —
    alt(alt(i, fp), fp) == i — which the eviction loop relies on to keep
    every fingerprint reachable from its two candidate buckets."""
    x = (fp.astype(np.uint64) * np.uint64(0x5BD1E995)) & np.uint64(NSLOTS - 1)
    return (i.astype(np.uint64) ^ x).astype(np.int64)


def _empty_table() -> np.ndarray:
    return np.zeros((NSLOTS, SLOTS_PER_BUCKET), dtype=np.uint16)


def _insert_into(table: np.ndarray, hashes: np.ndarray, rng_seed: int) -> int:
    """Insert all hashes into table (mutates). Returns count NOT placed
    (table overfull — callers treat those keys as maybe_seen=True, keeping
    the no-false-negative contract). Deterministic: eviction choice seeded.

    Shape: three vectorized passes drain the bulk in O(n) numpy —
    (1) within-batch (i1, fp) de-dup, (2) already-present filter against
    the existing table, (3) bucketed scatter where the r-th key of a
    bucket claims the bucket's r-th free slot — and only the residue
    (keys whose primary bucket ran out of free slots) runs the classic
    per-item i2-then-evict loop in Python."""
    fp = _fingerprint(hashes)
    i1 = _index1(hashes)
    i2 = _alt_index(i1, fp)
    # pass 1 — de-dup within the batch: keys the filter cannot tell apart
    # (same fingerprint AND same unordered {i1, i2} bucket pair) insert
    # once. Since i2 = i1 XOR g(fp), two equal-fp keys share the bucket
    # pair iff min(i1, i2) matches, so (min, fp) is the canonical entry
    # key. Keying on bare (i1, fp) let a mirrored pair — i1_a == i2_b and
    # i2_a == i1_b — store two copies, which a single delete only half
    # cleared: the expired key kept probing maybe_seen forever and wasted
    # a slot (ADVICE r2). This matches incremental-insert semantics, where
    # the second copy is caught by the pass-2 presence check.
    mn = np.minimum(i1, i2).astype(np.uint64)
    _, first = np.unique(
        mn << np.uint64(16) | fp.astype(np.uint64),
        return_index=True,
    )
    keep = np.sort(first)
    fp, i1, i2 = fp[keep], i1[keep], i2[keep]
    # pass 2 — drop keys already present in either candidate bucket
    present = (table[i1] == fp[:, None]).any(axis=1) | (
        table[i2] == fp[:, None]
    ).any(axis=1)
    fp, i1, i2 = fp[~present], i1[~present], i2[~present]
    # pass 3 — bucketed scatter into i1's free slots: sort keys by bucket,
    # rank r within its bucket claims the bucket's r-th empty slot (both
    # ranks and slot targets computed vectorized; buckets are disjoint
    # table rows, ranks are distinct within a bucket, so no write races)
    order = np.argsort(i1, kind="stable")
    fp, i1, i2 = fp[order], i1[order], i2[order]
    if len(i1):
        starts = np.r_[True, i1[1:] != i1[:-1]]
        run_start = np.arange(len(i1))[starts]
        rank = np.arange(len(i1)) - np.repeat(run_start, np.diff(np.r_[run_start, len(i1)]))
        emp = table[i1] == 0  # (n, SLOTS) — emptiness BEFORE this pass
        cumempty = np.cumsum(emp, axis=1)
        placed = np.zeros(len(i1), dtype=bool)
        for s in range(SLOTS_PER_BUCKET):
            take = (~placed) & emp[:, s] & (cumempty[:, s] == rank + 1)
            table[i1[take], s] = fp[take]
            placed |= take
        rest = np.where(~placed)[0]
    else:
        rest = np.empty(0, dtype=np.int64)
    # residue — per-item alternate-bucket try, then seeded eviction loop
    rng = np.random.RandomState(rng_seed)
    failed = 0
    for k in rest:
        f, b = fp[k], i2[k]
        row_b = table[b]
        eb = np.where(row_b == 0)[0]
        if len(eb):
            row_b[eb[0]] = f
            continue
        cur_f, cur_i = f, int(i1[k] if rng.randint(2) else b)
        placed_one = False
        for _kick in range(MAX_KICKS):
            slot = rng.randint(SLOTS_PER_BUCKET)
            cur_f, table[cur_i, slot] = table[cur_i, slot], cur_f
            cur_i = int(_alt_index(np.array([cur_i]), np.array([cur_f]))[0])
            empty = np.where(table[cur_i] == 0)[0]
            if len(empty):
                table[cur_i, empty[0]] = cur_f
                placed_one = True
                break
        if not placed_one:
            # place back best-effort marker is impossible; count as overflow
            failed += 1
    return failed


def build_seen_cuckoo(seen: DataFrame, nshards: int = NBUCKETS_CK) -> DataFrame:
    """seen(url_hash) → cuckoo(bucket int, table binary, overflow long).
    One grouped-map Arrow UDF per shard."""

    def _build(pdf: pd.DataFrame) -> pd.DataFrame:
        table = _empty_table()
        failed = _insert_into(
            table, pdf["url_hash"].to_numpy(), rng_seed=int(pdf["bucket"].iloc[0])
        )
        return pd.DataFrame(
            {
                "bucket": [int(pdf["bucket"].iloc[0])],
                "table": [table.tobytes()],
                "overflow": [failed],
            }
        )

    shards = seen.select(
        "url_hash",
        F.pmod(F.col("url_hash"), F.lit(nshards)).cast("int").alias("bucket"),
    )
    return shards.groupBy("bucket").applyInPandas(
        _build, "bucket int, table binary, overflow long"
    )


def _probe_table(table: np.ndarray, hashes: np.ndarray, overflow: int) -> np.ndarray:
    fp = _fingerprint(hashes)
    i1 = _index1(hashes)
    i2 = _alt_index(i1, fp)
    hit = (table[i1] == fp[:, None]).any(axis=1) | (
        table[i2] == fp[:, None]
    ).any(axis=1)
    if overflow:
        # shard lost fingerprints to overflow → stay conservative
        return np.ones_like(hit, dtype=bool)
    return hit


def probe_seen_cuckoo(
    candidates: DataFrame, cuckoo: DataFrame, nshards: int = NBUCKETS_CK
) -> DataFrame:
    """candidates(+url_hash) → + maybe_seen boolean (cogrouped per shard)."""
    cand = candidates.withColumn(
        "bucket", F.pmod(F.col("url_hash"), F.lit(nshards)).cast("int")
    )
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in cand.schema.fields
    ) + ", maybe_seen boolean"

    def _probe(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty:
            return left.assign(maybe_seen=pd.Series([], dtype=bool))
        if right.empty:
            return left.assign(maybe_seen=False)
        table = np.frombuffer(right["table"].iloc[0], dtype=np.uint16).reshape(
            NSLOTS, SLOTS_PER_BUCKET
        )
        hit = _probe_table(
            table, left["url_hash"].to_numpy(), int(right["overflow"].iloc[0])
        )
        return left.assign(maybe_seen=hit)

    return (
        cand.groupBy("bucket")
        .cogroup(cuckoo.groupBy("bucket"))
        .applyInPandas(_probe, out_schema)
    )


def delete_from_cuckoo(
    cuckoo: DataFrame, deletes: DataFrame, nshards: int = NBUCKETS_CK
) -> DataFrame:
    """Remove fingerprints for deletes(url_hash) — the capability the bloom
    cannot offer (recrawl-after-TTL un-seeing). One matching fingerprint
    copy is cleared per deleted key, cogrouped per shard.

    PRECONDITION (the classic cuckoo-filter deletion contract, Fan et al.
    §3.3): every deleted key must have been previously inserted and not
    already deleted. Deleting a never-inserted key can clear a colliding
    key's identical fingerprint, breaking the no-false-negative guarantee
    for that other key. Duplicate url_hash rows in `deletes` are collapsed
    here (one clear per key); inserted-ness cannot be checked from the
    filter alone — callers that cannot prove it should inner-join their
    delete set against the exact seen table first (recrawl_expire below
    does exactly that)."""
    dels = deletes.select(
        "url_hash",
        F.pmod(F.col("url_hash"), F.lit(nshards)).cast("int").alias("bucket"),
    ).dropDuplicates(["url_hash"])

    def _delete(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty:
            return pd.DataFrame(
                {"bucket": [], "table": [], "overflow": []}
            ).astype({"bucket": "int32", "overflow": "int64"})
        table = np.frombuffer(left["table"].iloc[0], dtype=np.uint16).reshape(
            NSLOTS, SLOTS_PER_BUCKET
        ).copy()
        overflow = int(left["overflow"].iloc[0])
        if not right.empty:
            h = right["url_hash"].to_numpy()
            fp, i1 = _fingerprint(h), _index1(h)
            i2 = _alt_index(i1, fp)
            for k in range(len(h)):
                for idx in (i1[k], i2[k]):
                    slots = np.where(table[idx] == fp[k])[0]
                    if len(slots):
                        table[idx, slots[0]] = 0
                        break
        return pd.DataFrame(
            {
                "bucket": [int(left["bucket"].iloc[0])],
                "table": [table.tobytes()],
                "overflow": [overflow],
            }
        )

    return (
        cuckoo.groupBy("bucket")
        .cogroup(dels.groupBy("bucket"))
        .applyInPandas(_delete, "bucket int, table binary, overflow long")
    )


def recrawl_expire(
    seen: DataFrame,
    cuckoo: DataFrame,
    expired: DataFrame,
    nshards: int = NBUCKETS_CK,
) -> tuple[DataFrame, DataFrame]:
    """Recrawl-after-TTL: un-see `expired` URLs so the next round can
    schedule them again (the deletable-filter capability that motivates
    the cuckoo variant over the bloom — module header; BASELINE.json:6).

    Returns (new_seen, new_cuckoo):
    - new_seen  = seen ANTI-JOIN expired on url_norm — membership truth
      stays the exact table, exactly as in the forward path (A7);
    - new_cuckoo = delete_from_cuckoo over expired ∩ seen — the inner
      join enforces delete_from_cuckoo's only-previously-inserted
      precondition even when callers pass expiry candidates that were
      never crawled.

    Shape at scale: one 16-byte-key anti-join plus one cogrouped Arrow
    pass over the filter shards; the seen table is never rewritten beyond
    the anti-join output the caller chooses to persist."""
    expired_keys = expired.select("url_norm", "url_hash").dropDuplicates(["url_norm"])
    new_seen = seen.join(
        expired_keys.select("url_norm"), "url_norm", "left_anti"
    )
    safe_deletes = expired_keys.join(
        seen.select("url_norm").distinct(), "url_norm", "left_semi"
    ).select("url_hash")
    new_cuckoo = delete_from_cuckoo(cuckoo, safe_deletes, nshards)
    return new_seen, new_cuckoo
