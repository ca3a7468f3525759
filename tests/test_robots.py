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


WILD_RULES = [
    {"allow": False, "prefix": "/*.pdf$"},
    {"allow": True, "prefix": "/docs/*.pdf$"},
    {"allow": False, "prefix": "/search*q="},
    {"allow": False, "prefix": "/exact$"},
    {"allow": True, "prefix": "/price$x"},  # '$' not final → literal
]

WILD_CASES = [
    ("/report.pdf", False),          # *.pdf$ matches at end
    ("/report.pdf.html", True),      # $ anchor: not an end match
    ("/docs/a.pdf", True),           # longer allow beats shorter disallow
    ("/search/web?q=x", False),      # '*' spans any chars
    ("/searchq=", False),            # '*' matches empty
    ("/exact", False),               # exact-path anchor
    ("/exact/sub", True),            # anchored rule doesn't match deeper
    ("/price$xy", True),             # literal mid-pattern '$'
    ("/other", True),
]


def test_robots_wildcards_python():
    """RFC 9309 §2.2.3: '*' any-sequence, final '$' end anchor."""
    for path, want in WILD_CASES:
        assert robots_allowed(path, WILD_RULES) is want, path


def test_with_robots_wildcards_native_matches_python(spark):
    urls = [f"http://w.example{p}" for p, _ in WILD_CASES]
    frontier = with_url_cols(spark.createDataFrame([(u,) for u in urls], ["url"]))
    robots = spark.createDataFrame(
        [("w.example", 1.0, WILD_RULES)],
        schema="host string, crawl_delay double, "
        "rules array<struct<allow:boolean,prefix:string>>",
    )
    got = {r.url_norm: r.allowed for r in with_robots(frontier, robots).collect()}
    for path, want in WILD_CASES:
        key = f"http://w.example{path}"
        assert got[key] is want, (path, got[key])


def test_robots_wildcard_property_native_equals_twin(spark):
    """Property sweep: for generated (pattern, path) combinations the
    native expression and the pure-Python twin must agree exactly."""
    import itertools

    pats = [
        "/a", "/a/*", "/a*b", "/*c$", "/a$", "/*", "*", "/a*", "/$",
        "/a*b*c", "/.p", "/(x)", "/a+b",
    ]
    paths = [
        "/a", "/a/", "/a/bb", "/ab", "/axb", "/xc", "/a$", "/", "/.p",
        "/(x)", "/a+b", "/aXbYc", "/cc",
    ]
    rules_sets = [
        [{"allow": i % 2 == 0, "prefix": p}]
        for i, p in enumerate(pats)
    ] + [[{"allow": False, "prefix": a}, {"allow": True, "prefix": b}]
         for a, b in itertools.combinations(pats[:6], 2)]
    rows = []
    expected = {}
    for ri, rules in enumerate(rules_sets):
        host = f"h{ri}.example"
        for pi, path in enumerate(paths):
            url = f"http://{host}{path}"
            rows.append((url, host, rules))
            expected[(host, path)] = robots_allowed(path, rules)
    frontier = spark.createDataFrame(
        [(u, h) for u, h, _ in rows], "url_norm string, host string"
    )
    robots = spark.createDataFrame(
        [(f"h{ri}.example", 1.0, rules) for ri, rules in enumerate(rules_sets)],
        schema="host string, crawl_delay double, "
        "rules array<struct<allow:boolean,prefix:string>>",
    )
    got = {
        (r.host, r.url_norm.split(".example", 1)[1]): r.allowed
        for r in with_robots(frontier, robots).collect()
    }
    assert got == expected


def test_parse_robots_agent_groups():
    """RFC 9309 §2.2.1: consecutive User-agent lines share a group; the
    crawler merges ALL groups matching its token (case-insensitive) and
    falls back to '*' groups only when none match."""
    txt = """
User-agent: googlebot
User-agent: ofs-crawler
Disallow: /shared/

User-agent: *
Disallow: /generic/
Crawl-delay: 3

User-agent: OFS-Crawler
Allow: /shared/ok
Crawl-delay: 1.5
"""
    ours = parse_robots_txt(txt, agent="ofs-crawler")
    assert ours["rules"] == [
        {"allow": False, "prefix": "/shared/"},
        {"allow": True, "prefix": "/shared/ok"},
    ]
    assert ours["crawl_delay"] == 1.5  # from a matched group, not '*'

    other = parse_robots_txt(txt, agent="someone-else")
    assert other["rules"] == [{"allow": False, "prefix": "/generic/"}]
    assert other["crawl_delay"] == 3.0

    generic = parse_robots_txt(txt)  # default '*' behavior unchanged
    assert generic["rules"] == [{"allow": False, "prefix": "/generic/"}]
