"""Kill/resume bit-for-bit equivalence (BASELINE.json:6; SURVEY.md §5.4):
run A = rounds 0..3 uninterrupted; run B = rounds 0..1, 'crash', resume to
3 in a fresh process-state — every committed table must be value-identical,
and a torn (uncommitted) round must be invisible to resume."""

from __future__ import annotations

import json
import os

from opps_feedcrawler_spark.plans.crawl import run_crawl

ROUNDS = 3


def _table_fingerprint(spark, log, round_no: int, name: str):
    df = log.load_table(spark, round_no, name)
    rows = [tuple(r) for r in df.collect()]
    return sorted(map(repr, rows))


def test_resume_bit_for_bit(spark, corpus_dfs, tmp_path):
    pages, seeds, robots = corpus_dfs
    wh_a = str(tmp_path / "a")
    wh_b = str(tmp_path / "b")
    log_a = run_crawl(spark, pages, seeds, robots, wh_a, rounds=ROUNDS)
    # interrupted run: stop after round 0, then resume
    log_b = run_crawl(spark, pages, seeds, robots, wh_b, rounds=1)
    assert log_b.latest_snapshot_id() == 0
    log_b = run_crawl(spark, pages, seeds, robots, wh_b, rounds=ROUNDS)

    from opps_feedcrawler_spark.plans.crawl import ROUND_TABLES

    assert log_a.snapshot_ids() == log_b.snapshot_ids()
    for r in log_a.snapshot_ids():
        for name in ROUND_TABLES:
            fa = _table_fingerprint(spark, log_a, r, name)
            fb = _table_fingerprint(spark, log_b, r, name)
            assert fa == fb, (r, name)
        ma = log_a.read_snapshot(r)["metrics"]
        mb = log_b.read_snapshot(r)["metrics"]
        assert ma == mb, r


def test_torn_snapshot_invisible(spark, corpus_dfs, tmp_path):
    pages, seeds, robots = corpus_dfs
    wh = str(tmp_path / "torn")
    log = run_crawl(spark, pages, seeds, robots, wh, rounds=2)
    # simulate a crash mid-commit: data for round 2 present, snapshot absent
    torn_dir = os.path.join(log.data_dir, "round=2", "junk")
    os.makedirs(torn_dir, exist_ok=True)
    with open(os.path.join(torn_dir, "part-0.parquet"), "wb") as f:
        f.write(b"torn")
    # a temp snapshot file must also be ignored
    with open(os.path.join(log.snap_dir, ".tmp-dead.json"), "w") as f:
        json.dump({"snapshot_id": 99}, f)
    assert log.latest_snapshot_id() == 1  # torn round invisible
    log2 = run_crawl(spark, pages, seeds, robots, wh, rounds=3)
    assert log2.latest_snapshot_id() == 2  # resumed cleanly over the wreckage


def test_seen_compaction_is_transparent(spark, corpus_dfs, tmp_path):
    """compact_seen folds deltas 0..k into a base; a crawl that resumes
    AFTER compaction must produce tables value-identical to an
    uncompacted run, load_seen must return the identical row set, and the
    read path must stop touching the compacted deltas' file list."""
    from opps_feedcrawler_spark.plans.crawl import load_seen

    pages, seeds, robots = corpus_dfs
    wh_a = str(tmp_path / "a")
    wh_b = str(tmp_path / "b")
    log_a = run_crawl(spark, pages, seeds, robots, wh_a, rounds=ROUNDS)

    log_b = run_crawl(spark, pages, seeds, robots, wh_b, rounds=2)
    base = log_b.compact_seen(spark, upto_round=1, partitions=4)
    assert base["upto"] == 1
    # compacted base == union of deltas 0..1, exactly
    base_rows = sorted(
        map(repr, ((r.url_norm, r.url_hash) for r in
                   spark.read.parquet(base["path"]).collect()))
    )
    delta_rows = sorted(
        map(repr, ((r.url_norm, r.url_hash) for r in
                   spark.read.parquet(
                       log_b.read_snapshot(0)["tables"]["seen_delta"]["path"],
                       log_b.read_snapshot(1)["tables"]["seen_delta"]["path"],
                   ).collect()))
    )
    assert base_rows == delta_rows

    log_b = run_crawl(spark, pages, seeds, robots, wh_b, rounds=ROUNDS)
    from opps_feedcrawler_spark.plans.crawl import ROUND_TABLES

    for r in log_a.snapshot_ids():
        for name in ROUND_TABLES:
            assert _table_fingerprint(spark, log_a, r, name) == \
                _table_fingerprint(spark, log_b, r, name), (r, name)

    # the post-compaction read path uses base + later deltas only
    seen_b = load_seen(spark, log_b, ROUNDS - 1)
    seen_a = load_seen(spark, log_a, ROUNDS - 1)
    sa = sorted(map(repr, ((r.url_norm, r.url_hash) for r in seen_a.collect())))
    sb = sorted(map(repr, ((r.url_norm, r.url_hash) for r in seen_b.collect())))
    assert sa == sb
    files = seen_b.inputFiles()
    assert any("seen_base=1" in f for f in files)
    assert not any("round=0/seen_delta" in f or "round=1/seen_delta" in f for f in files)


def test_vacuum_engine_state_resume_transparent(spark, corpus_dfs, tmp_path):
    """vacuum_engine_state deletes superseded frontier/bloom/schedule data
    for old rounds; product tables survive, resume continues from the
    latest (untouched) snapshot, and time travel to vacuumed state fails
    loudly."""
    import pytest

    pages, seeds, robots = corpus_dfs
    wh_a = str(tmp_path / "a")
    wh_b = str(tmp_path / "b")
    log_a = run_crawl(spark, pages, seeds, robots, wh_a, rounds=ROUNDS)

    log_b = run_crawl(spark, pages, seeds, robots, wh_b, rounds=2)
    assert log_b.vacuum_engine_state(keep_last=1) == [0]
    # product tables for round 0 still readable and identical
    for name in ("text", "entries", "fetch_log"):
        assert _table_fingerprint(spark, log_b, 0, name) == \
            _table_fingerprint(spark, log_a, 0, name), name
    # vacuumed engine state fails loudly
    with pytest.raises(KeyError):
        log_b.load_table(spark, 0, "frontier")
    # resume continues bit-for-bit from the latest snapshot
    log_b = run_crawl(spark, pages, seeds, robots, wh_b, rounds=ROUNDS)
    from opps_feedcrawler_spark.plans.crawl import ROUND_TABLES

    for name in ROUND_TABLES:
        assert _table_fingerprint(spark, log_a, ROUNDS - 1, name) == \
            _table_fingerprint(spark, log_b, ROUNDS - 1, name), name


def test_compact_every_in_engine_loop(spark, corpus_dfs, tmp_path):
    """run_crawl(compact_seen_every=2) must produce identical output to an
    uncompacted run and leave a committed base behind."""
    pages, seeds, robots = corpus_dfs
    wh_a = str(tmp_path / "a")
    wh_b = str(tmp_path / "b")
    log_a = run_crawl(spark, pages, seeds, robots, wh_a, rounds=ROUNDS)
    log_b = run_crawl(
        spark, pages, seeds, robots, wh_b, rounds=ROUNDS, compact_seen_every=2
    )
    assert log_b.latest_seen_base(ROUNDS - 1) is not None
    from opps_feedcrawler_spark.plans.crawl import ROUND_TABLES

    for r in log_a.snapshot_ids():
        for name in ROUND_TABLES:
            assert _table_fingerprint(spark, log_a, r, name) == \
                _table_fingerprint(spark, log_b, r, name), (r, name)


def test_vacuum_keep_in_engine_loop(spark, corpus_dfs, tmp_path):
    """run_crawl(vacuum_keep=1) prunes superseded engine state after every
    committed round INSIDE the loop, and is fully output-transparent:
    product tables + final frontier/seen identical to a lifecycle-off run,
    only the latest round's engine state remains on disk."""
    from opps_feedcrawler_spark.plans.crawl import ROUND_TABLES

    pages, seeds, robots = corpus_dfs
    wh_a = str(tmp_path / "a")
    wh_v = str(tmp_path / "v")
    log_a = run_crawl(spark, pages, seeds, robots, wh_a, rounds=ROUNDS)
    log_v = run_crawl(
        spark, pages, seeds, robots, wh_v, rounds=ROUNDS,
        compact_seen_every=2, vacuum_keep=1,
    )
    last = ROUNDS - 1
    # product tables identical for EVERY round (never vacuumed)
    for r in range(ROUNDS):
        for name in ("text", "entries", "fetch_log", "seen_delta"):
            assert _table_fingerprint(spark, log_a, r, name) == \
                _table_fingerprint(spark, log_v, r, name), (r, name)
    # latest engine state identical (what a resume would read)
    for name in ROUND_TABLES:
        assert _table_fingerprint(spark, log_a, last, name) == \
            _table_fingerprint(spark, log_v, last, name), name
    # older engine state actually pruned
    import pytest

    with pytest.raises(KeyError):
        log_v.load_table(spark, 0, "frontier")
    assert log_v.read_snapshot(0)["expired_tables"]
    # and a further resume continues cleanly on the vacuumed warehouse
    log_v2 = run_crawl(
        spark, pages, seeds, robots, wh_v, rounds=ROUNDS + 1, vacuum_keep=1
    )
    assert log_v2.latest_snapshot_id() == ROUNDS
