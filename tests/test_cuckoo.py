"""Cuckoo seen-filter tests: no false negatives (the contract that lets it
pre-filter the exact anti-join), deletion support, overflow conservatism."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from opps_feedcrawler_spark.operators.cuckoo import (
    NSLOTS,
    SLOTS_PER_BUCKET,
    _empty_table,
    _insert_into,
    _probe_table,
    build_seen_cuckoo,
    delete_from_cuckoo,
    probe_seen_cuckoo,
)


def _hashes(n: int, seed: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.randint(-(2**62), 2**62, size=n, dtype=np.int64)


def test_local_no_false_negatives_and_low_fp():
    table = _empty_table()
    ins = _hashes(3000, 1)
    failed = _insert_into(table, ins, rng_seed=0)
    assert failed == 0  # 3000 « NSLOTS*4 capacity
    assert _probe_table(table, ins, 0).all()  # every inserted key probes True
    other = _hashes(3000, 2)
    fp_rate = _probe_table(table, other, 0).mean()
    assert fp_rate < 0.05, fp_rate  # 16-bit fingerprints → tiny FP rate


def test_local_overflow_is_conservative():
    table = _empty_table()
    too_many = _hashes(NSLOTS * SLOTS_PER_BUCKET * 2, 3)
    failed = _insert_into(table, too_many, rng_seed=0)
    assert failed > 0
    # overflow shards answer True for EVERYTHING (no false negatives)
    assert _probe_table(table, _hashes(100, 4), failed).all()


def test_spark_build_probe_delete(spark):
    seen = spark.createDataFrame(
        pd.DataFrame({"url_hash": _hashes(5000, 7)})
    )
    ck = build_seen_cuckoo(seen)
    assert ck.agg(F.sum("overflow")).collect()[0][0] == 0

    cand_seen = seen.withColumn("tag", F.lit("s"))
    probed = probe_seen_cuckoo(cand_seen, ck)
    n_missed = probed.filter(~F.col("maybe_seen")).count()
    assert n_missed == 0  # no false negatives through the Spark path

    fresh = spark.createDataFrame(
        pd.DataFrame({"url_hash": _hashes(5000, 8), "tag": "f"})
    )
    fp_rate = (
        probe_seen_cuckoo(fresh, ck).filter(F.col("maybe_seen")).count() / 5000
    )
    assert fp_rate < 0.05, fp_rate

    # delete half the seen keys → they stop probing True (minus fp noise)
    half = seen.limit(2500)
    ck2 = delete_from_cuckoo(ck, half)
    still = (
        probe_seen_cuckoo(half.withColumn("tag", F.lit("d")), ck2)
        .filter(F.col("maybe_seen"))
        .count()
    )
    assert still / 2500 < 0.05, still
    # the untouched half must STILL have no false negatives
    kept = seen.subtract(half)
    missed = (
        probe_seen_cuckoo(kept.withColumn("tag", F.lit("k")), ck2)
        .filter(~F.col("maybe_seen"))
        .count()
    )
    assert missed == 0


def test_recrawl_expire_unsees_and_reschedules(spark):
    """TTL recrawl (the capability that motivates the cuckoo variant):
    expiring a URL removes it from BOTH the exact seen table and the
    cuckoo filter, so the standard pre-filter + anti-join path schedules
    it again; never-crawled expiry candidates are ignored (the deletion
    precondition), and unexpired URLs keep the no-false-negative
    guarantee."""
    from opps_feedcrawler_spark.operators.cuckoo import (
        build_seen_cuckoo,
        probe_seen_cuckoo,
        recrawl_expire,
    )

    urls = [(f"http://h{i % 9}.example/p/{i}", i * 2654435761 % (1 << 62)) for i in range(400)]
    seen = spark.createDataFrame(urls, "url_norm string, url_hash long")
    ck = build_seen_cuckoo(seen)

    # expire every 4th crawled URL + 50 never-crawled candidates (+ dups)
    expired_real = [u for i, u in enumerate(urls) if i % 4 == 0]
    expired_bogus = [
        (f"http://never{i}.example/x", (10_000 + i) * 2654435761 % (1 << 62))
        for i in range(50)
    ]
    expired = spark.createDataFrame(
        expired_real + expired_real[:10] + expired_bogus,
        "url_norm string, url_hash long",
    )
    new_seen, new_ck = recrawl_expire(seen, ck, expired)

    # exact membership truth: expired gone, rest intact
    kept = {r.url_norm for r in new_seen.collect()}
    assert kept == {u for u, _ in urls} - {u for u, _ in expired_real}

    # pre-filter: expired keys now probe mostly-false (fp noise only),
    # unexpired keys still NEVER probe false
    exp_df = spark.createDataFrame(expired_real, "url_norm string, url_hash long")
    still = probe_seen_cuckoo(exp_df, new_ck).filter(F.col("maybe_seen")).count()
    assert still / len(expired_real) < 0.05, still
    kept_df = new_seen
    missed = probe_seen_cuckoo(kept_df, new_ck).filter(~F.col("maybe_seen")).count()
    assert missed == 0

    # end-to-end: the frontier anti-join now lets expired URLs through
    from opps_feedcrawler_spark.operators.seen import exact_new_urls

    frontier = spark.createDataFrame(
        expired_real + urls[1:8], "url_norm string, url_hash long"
    )
    passed = {r.url_norm for r in exact_new_urls(frontier, new_seen).collect()}
    assert passed == {u for u, _ in expired_real}
