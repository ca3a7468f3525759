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


def test_stream_seed_ingest_exactly_once_across_restarts(spark, tmp_path):
    """Two drains over the same checkpoint: batch-2 re-deliveries of
    batch-1 URLs (including non-canonical aliases of them) must not
    re-enter the frontier; new URLs must. This is the checkpointed-dedup
    contract continuous seed feeding relies on."""
    from opps_feedcrawler_spark.streaming.ingest import (
        run_available_now,
        stream_seed_ingest,
    )

    seeds = tmp_path / "seeds"
    out = tmp_path / "out"
    ck = tmp_path / "ck"
    seeds.mkdir()
    (seeds / "b1.txt").write_text(
        "http://a.example/x\n"
        "# a comment line\n"
        "HTTP://A.EXAMPLE:80/x\n"          # alias of the first
        "http://b.example/y?b=2&a=1\n"
        "\n"
    )
    run_available_now(stream_seed_ingest(spark, str(seeds)), str(out), str(ck))
    first = {r.url_norm for r in spark.read.parquet(str(out)).collect()}
    assert first == {
        "http://a.example/x",
        "http://b.example/y?a=1&b=2",
    }
    # second feed: one duplicate (alias form), one genuinely new URL
    (seeds / "b2.txt").write_text(
        "http://a.example/./x\n"
        "http://c.example/z\n"
    )
    run_available_now(stream_seed_ingest(spark, str(seeds)), str(out), str(ck))
    rows = [r.url_norm for r in spark.read.parquet(str(out)).collect()]
    assert sorted(rows) == sorted(first | {"http://c.example/z"})
    assert len(rows) == 3  # no re-delivery of batch-1 rows
