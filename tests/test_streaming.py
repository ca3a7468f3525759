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
