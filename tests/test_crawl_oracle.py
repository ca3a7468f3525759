"""End-to-end crawl equivalence vs the single-threaded oracle
(SURVEY.md §5.3): (a) per-round scheduled order, (b) final URL-seen set,
(c) byte-identical extracted text per url (BASELINE.json:6,14,16)."""

from __future__ import annotations

import pytest

from opps_feedcrawler_spark.plans.crawl import run_crawl

from .oracle_crawler import OracleCrawler

ROUNDS = 3


@pytest.fixture(scope="module")
def engine_log(spark, corpus_dfs, tmp_path_factory):
    pages, seeds, robots = corpus_dfs
    wh = str(tmp_path_factory.mktemp("warehouse"))
    return run_crawl(spark, pages, seeds, robots, wh, rounds=ROUNDS)


@pytest.fixture(scope="module")
def oracle(corpus):
    pages_pdf, seeds_pdf, robots_pdf = corpus
    o = OracleCrawler(pages_pdf, robots_pdf, list(seeds_pdf["url"]))
    o.run(ROUNDS)
    return o


def test_schedule_order_matches(spark, engine_log, oracle):
    last = engine_log.latest_snapshot_id()
    got = []
    for r in range(last + 1):
        sched = engine_log.load_table(spark, r, "schedule")
        got.extend(
            (row.round, row.seq, row.url_norm)
            for row in sched.orderBy("round", "seq").collect()
        )
    assert got == oracle.schedule
    assert len(got) > 50  # non-trivial crawl actually happened


def test_seen_set_matches(spark, engine_log, oracle):
    from opps_feedcrawler_spark.plans.crawl import load_seen

    last = engine_log.latest_snapshot_id()
    seen = load_seen(spark, engine_log, last)
    got = {r.url_norm for r in seen.collect()}
    assert got == oracle.seen


def test_text_byte_identical(spark, engine_log, oracle):
    last = engine_log.latest_snapshot_id()
    got: dict[str, str] = {}
    for r in range(last + 1):
        for row in engine_log.load_table(spark, r, "text").collect():
            got[row.url] = row.text
    assert got.keys() == oracle.texts.keys()
    for url, text in oracle.texts.items():
        assert got[url].encode() == text.encode(), url


def test_entries_match(spark, engine_log, oracle):
    last = engine_log.latest_snapshot_id()
    got = set()
    for r in range(last + 1):
        for row in engine_log.load_table(spark, r, "entries").collect():
            got.add((row.page_url, row.entry_guid, row.title, row.link))
    want = {
        (e["page_url"], e["entry_guid"], e["title"], e["link"])
        for e in oracle.entries
    }
    assert got == want
    assert len(want) > 0


def test_frontier_grows_beyond_seeds(spark, engine_log, corpus):
    from opps_feedcrawler_spark.plans.crawl import load_seen

    _, seeds_pdf, _ = corpus
    last = engine_log.latest_snapshot_id()
    seen = load_seen(spark, engine_log, last).count()
    assert seen > len(seeds_pdf)  # link growth happened


def test_politeness_invariant(spark, engine_log, oracle):
    """No host exceeds its per-round budget in any round."""
    from opps_feedcrawler_spark.operators.politeness import budget_for_delay

    last = engine_log.latest_snapshot_id()
    for r in range(last + 1):
        sched = engine_log.load_table(spark, r, "schedule").collect()
        per_host: dict[str, int] = {}
        for row in sched:
            per_host[row.host] = per_host.get(row.host, 0) + 1
        for host, n in per_host.items():
            delay = oracle.robots.get(host, (None, None))[0]
            assert n <= budget_for_delay(delay), (r, host, n)
