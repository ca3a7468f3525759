"""Real-network fetch stage (sources/httpfetch.py) driven against a local
loopback HTTP server: statuses, body bytes, size caps and the adapter into
the fused-parse page shape. The corpus-join path stays the sandbox default;
this is the production swap's unit coverage."""

from __future__ import annotations

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest
from pyspark.sql import functions as F

from opps_feedcrawler_spark.sources.httpfetch import (
    fetch_http,
    fetched_as_pages,
)

PAGE = b"<html><body><p>hello from %s</p></body></html>"
BIG = b"x" * 5000


class _Handler(BaseHTTPRequestHandler):
    def do_GET(self):  # noqa: N802
        if self.path.startswith("/page/"):
            body = PAGE % self.path.encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
        elif self.path == "/big":
            self.send_response(200)
            self.send_header("Content-Length", str(len(BIG)))
            self.end_headers()
            self.wfile.write(BIG)
        elif self.path == "/missing":
            self.send_error(404)
        else:
            self.send_error(500)

    def log_message(self, *a):  # silence
        pass


@pytest.fixture(scope="module")
def server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_fetch_http_statuses_and_bodies(spark, server):
    urls = [
        (f"{server}/page/a", "127.0.0.1"),
        (f"{server}/page/b", "127.0.0.1"),
        (f"{server}/missing", "127.0.0.1"),
        (f"{server}/boom", "127.0.0.1"),
        ("http://127.0.0.1:1/unreachable", "127.0.0.1"),
    ]
    df = spark.createDataFrame(urls, "url_norm string, host string")
    rows = {r.url_norm: r for r in fetch_http(df, timeout_s=3.0).collect()}
    assert rows[f"{server}/page/a"].status == 200
    assert rows[f"{server}/page/a"].html == PAGE % b"/page/a"
    assert rows[f"{server}/page/a"].bytes == len(PAGE % b"/page/a")
    assert rows[f"{server}/missing"].status == 404
    assert rows[f"{server}/missing"].html is None
    assert rows[f"{server}/boom"].status == 500
    assert rows["http://127.0.0.1:1/unreachable"].status == 0  # transport


def test_fetch_http_caps_body_size(spark, server):
    df = spark.createDataFrame([(f"{server}/big", "h")], "url_norm string, host string")
    r = fetch_http(df, max_bytes=1000).collect()[0]
    assert r.status == 200 and r.bytes == 1000 and len(r.html) == 1000


def test_fetched_as_pages_feeds_the_parse_stage(spark, server):
    from opps_feedcrawler_spark.functions.extract import extract_all_udf

    urls = [(f"{server}/page/{i}", "127.0.0.1") for i in range(4)] + [
        (f"{server}/missing", "127.0.0.1")
    ]
    df = spark.createDataFrame(urls, "url_norm string, host string")
    pages = fetched_as_pages(fetch_http(df))
    parsed = pages.select(
        "url_norm", extract_all_udf("html", "url_norm").alias("ex")
    ).select("url_norm", F.col("ex.text").alias("text"))
    got = {r.url_norm: r.text for r in parsed.collect()}
    assert len(got) == 4  # 404 filtered out
    for i in range(4):
        assert got[f"{server}/page/{i}"] == f"hello from /page/{i}"


def test_crawl_round_http_mode_end_to_end(spark, server):
    """One full crawl_round with fetch_mode='http': schedule → loopback
    fetch → fused parse; fetch_log misses come from the HTTP layer and
    text rows are byte-identical to the corpus-path extraction of the
    same bodies."""
    from opps_feedcrawler_spark.plans.crawl import crawl_round, seeds_to_frontier

    seeds = spark.createDataFrame(
        [(f"{server}/page/{i}",) for i in range(6)] + [(f"{server}/missing",)],
        ["url"],
    )
    frontier = seeds_to_frontier(seeds)
    seen = spark.createDataFrame([], "url_norm string, url_hash long")
    robots = spark.createDataFrame(
        [], "host string, crawl_delay double, "
        "rules array<struct<allow:boolean,prefix:string>>"
    )
    empty_pages = spark.createDataFrame([], "url_norm string, html binary")
    out = crawl_round(
        spark, frontier, seen, None, empty_pages, robots, 0, fetch_mode="http"
    )
    out["materialize"]()
    log = {r.url_norm: r.status for r in out["fetch_log"].collect()}
    assert sum(1 for s in log.values() if s == 200) == 6
    assert sum(1 for s in log.values() if s == 404) == 1
    texts = {r.url: r.text for r in out["text"].collect()}
    assert len(texts) == 6
    for u, t in texts.items():
        assert t.startswith("hello from /page/")
    out["cleanup"]()
