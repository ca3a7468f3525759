from __future__ import annotations

from pyspark.sql import functions as F

from opps_feedcrawler_spark.functions.urlnorm import with_url_cols
from opps_feedcrawler_spark.operators.robots import (
    parse_robots_txt,
    robots_allowed,
    with_robots,
)

RULES = [
    {"allow": False, "prefix": "/private/"},
    {"allow": True, "prefix": "/private/ok"},
    {"allow": False, "prefix": "/p"},
    {"allow": True, "prefix": "/public"},
]

CASES = [
    ("/private/x", False),
    ("/private/ok/deep", True),
    ("/p/1", False),
    ("/public/page", True),  # longer allow beats shorter disallow
    ("/other", True),
    ("/", True),
]


def test_robots_allowed_python():
    for path, want in CASES:
        assert robots_allowed(path, RULES) is want, path
    assert robots_allowed("/anything", []) is True
    assert robots_allowed("/anything", None) is True


def test_parse_robots_txt():
    txt = """# comment
User-agent: googlebot
Disallow: /g-only/

User-agent: *
Disallow: /private/
Allow: /private/ok
Crawl-delay: 2.5
"""
    parsed = parse_robots_txt(txt)
    assert parsed["crawl_delay"] == 2.5
    assert parsed["rules"] == [
        {"allow": False, "prefix": "/private/"},
        {"allow": True, "prefix": "/private/ok"},
    ]


def test_with_robots_native_matches_python(spark):
    urls = [f"http://h.example{path}" for path, _ in CASES] + [
        "http://unknown.example/private/x"
    ]
    frontier = with_url_cols(spark.createDataFrame([(u,) for u in urls], ["url"]))
    robots = spark.createDataFrame(
        [("h.example", 1.0, RULES)],
        schema="host string, crawl_delay double, "
        "rules array<struct<allow:boolean,prefix:string>>",
    )
    got = {
        r.url_norm: r.allowed for r in with_robots(frontier, robots).collect()
    }
    for path, want in CASES:
        assert got[f"http://h.example{path}".rstrip("/") if path != "/" else "http://h.example/"] is want, path
    assert got["http://unknown.example/private/x"] is True
