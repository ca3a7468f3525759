from __future__ import annotations

from pyspark.sql import functions as F

from opps_feedcrawler_spark.operators.seen import (
    build_seen_bloom,
    exact_new_urls,
    filter_new_urls,
    probe_seen_bloom,
)


def _urls(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], ["url_norm"])
    return df.withColumn("url_hash", F.xxhash64("url_norm"))


def test_bloom_no_false_negatives(spark):
    seen = _urls(spark, [f"http://h{i % 7}.example/p/{i}" for i in range(500)])
    bloom = build_seen_bloom(seen, nbuckets=8, bits=1 << 14)
    probed = probe_seen_bloom(seen, bloom, nbuckets=8, bits=1 << 14)
    assert probed.filter(~F.col("maybe_seen")).count() == 0


def test_bloom_prefilter_matches_exact_antijoin(spark):
    seen = _urls(spark, [f"http://h{i % 5}.example/s/{i}" for i in range(300)])
    cand = _urls(
        spark,
        [f"http://h{i % 5}.example/s/{i}" for i in range(200, 400)]
        + [f"http://h{i % 5}.example/new/{i}" for i in range(100)],
    )
    bloom = build_seen_bloom(seen, nbuckets=8, bits=1 << 14)
    with_bloom = {
        r.url_norm
        for r in filter_new_urls(cand, seen, bloom, nbuckets=8, bits=1 << 14).collect()
    }
    exact = {r.url_norm for r in exact_new_urls(cand, seen).collect()}
    assert with_bloom == exact
    assert len(exact) == 200  # 100 unseen /s/ + 100 /new/
