"""Feed-registry API tests (plans/feeds.py): registration defaults,
processor dispatch (strict vs auto), max_entries cap, publish flag, dedup
by guid-else-link — the reference's Feed/Entry semantics [PK]."""

from __future__ import annotations

from pyspark.sql import functions as F

from opps_feedcrawler_spark.plans.feeds import (
    FEEDS_SCHEMA,
    process_feeds,
    register_feeds,
)

RSS = (
    '<rss version="2.0"><channel>'
    "<item><guid>g1</guid><title> One </title><link>http://x.example/1</link></item>"
    "<item><title>Two</title><link>http://x.example/2</link></item>"
    "<item><guid>g1</guid><title>DupGuid</title><link>http://x.example/3</link></item>"
    "<item><guid>g4</guid><title>Four</title><link>http://x.example/4</link></item>"
    "</channel></rss>"
).encode()

ATOM = (
    '<feed xmlns="http://www.w3.org/2005/Atom">'
    '<entry><id>a1</id><title>A-One</title><link href="http://y.example/1"/></entry>'
    "</feed>"
).encode()


def _pages(spark):
    return spark.createDataFrame(
        [
            ("http://rss.example/feed", RSS),
            ("http://atom.example/feed", ATOM),
        ],
        "url_norm string, html binary",
    )


def _feeds(spark, rows):
    return spark.createDataFrame(rows, FEEDS_SCHEMA)


def test_register_defaults_and_canonicalization(spark):
    reg = register_feeds(
        _feeds(
            spark,
            [(1, "My Feed!", None, "HTTP://RSS.example:80/feed#top", None, None, None, None)],
        )
    ).collect()[0]
    assert reg.slug == "my-feed-"
    assert reg.feed_url == "http://rss.example/feed"
    assert reg.group_name == "default"
    assert reg.processor == "auto"
    assert reg.max_entries == 100
    assert reg.publish is True


def test_process_cap_dedup_and_order(spark):
    reg = register_feeds(
        _feeds(spark, [(1, "F", None, "http://rss.example/feed", None, "auto", 3, True)])
    )
    rows = sorted(
        process_feeds(reg, _pages(spark)).collect(), key=lambda r: r.pos
    )
    # reference loop semantics: dedup FIRST (item 3's dup guid g1 is
    # skipped and consumes no cap slot), then cap=3 inserts the next
    # unique entry (g4) — duplicates never shrink the published set
    assert [r.entry_guid for r in rows] == ["g1", "http://x.example/2", "g4"]
    assert rows[0].title == "One"  # trimmed
    assert rows[1].entry_guid == "http://x.example/2"  # guid falls back to link


def test_processor_strictness(spark):
    feeds = _feeds(
        spark,
        [
            (1, "R", None, "http://rss.example/feed", None, "atom", 10, True),
            (2, "A", None, "http://atom.example/feed", None, "atom", 10, True),
        ],
    )
    rows = process_feeds(register_feeds(feeds), _pages(spark)).collect()
    # feed 1 is RSS but demands the atom processor → dropped entirely
    assert {r.feed_id for r in rows} == {2}
    assert rows[0].entry_guid == "a1"


def test_publish_flag_filters(spark):
    feeds = _feeds(
        spark,
        [
            (1, "R", None, "http://rss.example/feed", None, "auto", 10, False),
            (2, "A", None, "http://atom.example/feed", None, "auto", 10, True),
        ],
    )
    rows = process_feeds(register_feeds(feeds), _pages(spark)).collect()
    assert {r.feed_id for r in rows} == {2}


def test_process_feeds_broadcasts_registry(spark):
    """The registry must be the build side — the page corpus streams."""
    import contextlib
    import io

    reg = register_feeds(
        _feeds(spark, [(1, "F", None, "http://rss.example/feed", None, "auto", 3, True)])
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        process_feeds(reg, _pages(spark)).explain()
    assert "BroadcastHashJoin" in buf.getvalue()
