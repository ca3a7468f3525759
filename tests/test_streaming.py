"""Streaming ingestion variant (B27/B30/B31) driven deterministically with
trigger(availableNow=True)."""

from __future__ import annotations

from datetime import datetime

from opps_feedcrawler_spark.streaming.ingest import (
    run_available_now,
    streaming_page_events,
)

SCHEMA = "url string, host string, ts timestamp"


def test_streaming_dedup_and_window(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    rows = [
        ("http://a.example/1", "a.example", datetime(2024, 3, 1, 10, 5)),
        ("http://a.example/1", "a.example", datetime(2024, 3, 1, 10, 6)),  # dup url
        ("http://a.example/2", "a.example", datetime(2024, 3, 1, 10, 20)),
        ("http://b.example/1", "b.example", datetime(2024, 3, 1, 11, 40)),
        # sentinel advances the watermark past 12:00 so the 10:00 and 11:00
        # windows close and emit in append mode; its own window stays open
        ("http://c.example/1", "c.example", datetime(2024, 3, 1, 13, 0)),
    ]
    spark.createDataFrame(rows, SCHEMA).write.parquet(src)
    result = streaming_page_events(spark, src, SCHEMA)
    run_available_now(result, out, ckpt)
    got = {
        (r.window_start, r.host): r.n_fetched
        for r in spark.read.parquet(out).collect()
    }
    assert got == {
        (datetime(2024, 3, 1, 10, 0), "a.example"): 2,  # dup url collapsed
        (datetime(2024, 3, 1, 11, 0), "b.example"): 1,
    }


def test_stateful_host_rate_tracks_across_batches(spark, tmp_path):
    """applyInPandasWithState operator: per-host cumulative fetch counts
    and min-gap politeness violations, with state carried ACROSS
    micro-batches (two source files + maxFilesPerTrigger=1 force two
    batches; the cross-batch gap must be checked against carried state)."""
    from opps_feedcrawler_spark.streaming.ingest import (
        run_available_now,
        stateful_host_rate,
    )

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    batch1 = [
        ("http://a.example/1", "a.example", datetime(2024, 3, 1, 10, 0, 0)),
        # 0.5s later -> violation (min gap 1s)
        ("http://a.example/2", "a.example", datetime(2024, 3, 1, 10, 0, 0, 500000)),
        ("http://b.example/1", "b.example", datetime(2024, 3, 1, 10, 0, 0)),
    ]
    batch2 = [
        # 0.2s after batch1's last a.example fetch -> CROSS-BATCH violation
        ("http://a.example/3", "a.example", datetime(2024, 3, 1, 10, 0, 0, 700000)),
        # 10s later -> fine
        ("http://b.example/2", "b.example", datetime(2024, 3, 1, 10, 0, 10)),
    ]
    spark.createDataFrame(batch1, SCHEMA).coalesce(1).write.parquet(src)
    spark.createDataFrame(batch2, SCHEMA).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    run_available_now(stateful_host_rate(stream, min_gap_s=1.0), out, ckpt)
    rows = spark.read.parquet(out).collect()
    # append emission: latest row per host carries the cumulative totals
    latest = {}
    for r in rows:
        if r.host not in latest or r.n_fetched > latest[r.host].n_fetched:
            latest[r.host] = r
    assert latest["a.example"].n_fetched == 3
    assert latest["a.example"].n_violations == 2  # one in-batch + one cross-batch
    assert latest["b.example"].n_fetched == 2
    assert latest["b.example"].n_violations == 0
