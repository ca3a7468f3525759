"""Round-3 batch-2 extraction surface: sitemap protocol parsing (urlset +
sitemapindex), anchor-text extraction, robots.txt Sitemap directives, and
the C4 quality-filter operator. Pure functions are tested byte-for-byte;
the operator through a live plan."""

from __future__ import annotations

from datetime import datetime

from opps_feedcrawler_spark.functions.extract import (
    extract_anchors_py,
    parse_sitemap_py,
)
from opps_feedcrawler_spark.operators.robots import parse_robots_txt

NS_URLSET = (
    '<?xml version="1.0" encoding="UTF-8"?>'
    '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
    "<url><loc>http://a.example/1</loc><lastmod>2024-03-04</lastmod>"
    "<changefreq>weekly</changefreq><priority>0.8</priority></url>"
    "<url><loc>http://a.example/2</loc></url>"
    "<url><lastmod>2024-01-01</lastmod></url>"  # no loc -> skipped
    "</urlset>"
)


def test_sitemap_urlset_full_and_minimal():
    got = parse_sitemap_py(NS_URLSET)
    assert [e["loc"] for e in got] == ["http://a.example/1", "http://a.example/2"]
    full, minimal = got
    assert full["lastmod_ts"] == datetime(2024, 3, 4)
    assert full["changefreq"] == "weekly"
    assert full["priority"] == 0.8
    assert full["is_index"] is False
    assert minimal["lastmod_ts"] is None
    assert minimal["changefreq"] is None
    assert minimal["priority"] is None


def test_sitemap_index_and_field_scoping():
    xml = (
        "<sitemapindex>"
        "<sitemap><loc>http://a.example/s1.xml</loc>"
        "<lastmod>2024-01-02T03:04:05Z</lastmod></sitemap>"
        "<sitemap><loc>http://a.example/s2.xml</loc>"
        # changefreq/priority are NOT index-entry fields: must stay None
        "<changefreq>daily</changefreq><priority>0.9</priority></sitemap>"
        "</sitemapindex>"
    )
    got = parse_sitemap_py(xml)
    assert [e["loc"] for e in got] == [
        "http://a.example/s1.xml",
        "http://a.example/s2.xml",
    ]
    assert got[0]["lastmod_ts"] == datetime(2024, 1, 2, 3, 4, 5)
    assert all(e["is_index"] for e in got)
    assert got[1]["changefreq"] is None and got[1]["priority"] is None


def test_sitemap_rejects_non_sitemap_documents():
    assert parse_sitemap_py(None) == []
    assert parse_sitemap_py("") == []
    assert parse_sitemap_py("<html><body>hi</body></html>") == []  # wrong root
    assert parse_sitemap_py("<urlset><url><loc>x</loc>") == []  # broken XML
    assert parse_sitemap_py(b"\x00\x01binary") == []


def test_sitemap_gzip_corrupt_deflate_quarantines():
    # A valid RFC 1952 header over a CORRUPT deflate stream makes
    # gzip.decompress raise zlib.error (not an OSError subclass) — the
    # fails-to-inflate -> [] contract must cover it too.
    import gzip

    gz = bytearray(gzip.compress(NS_URLSET.encode()))
    gz[12] ^= 0xFF  # flip a bit inside the deflate stream, past the header
    assert parse_sitemap_py(bytes(gz)) == []
    # sanity: the uncorrupted blob still parses
    assert len(parse_sitemap_py(gzip.compress(NS_URLSET.encode()))) >= 1


def test_sitemap_bad_priority_and_bytes_input():
    xml = (
        b"<urlset><url><loc>http://a.example/1</loc>"
        b"<priority>high</priority></url></urlset>"
    )
    got = parse_sitemap_py(xml)
    assert len(got) == 1 and got[0]["priority"] is None


def test_sitemap_gzip_transparent_and_torn_gzip_rejected():
    """sitemaps.org allows .xml.gz — gzipped bytes must parse exactly
    like the plain document; a torn gzip blob is not-a-sitemap, and a
    PLAIN document that merely begins with the two magic bytes is not
    treated as gzip (bytes-prefix check only fires on real members)."""
    import gzip

    xml = (
        b"<urlset><url><loc>http://a.example/1</loc>"
        b"<lastmod>2024-03-05T00:00:00Z</lastmod></url>"
        b"<url><loc>http://a.example/2</loc></url></urlset>"
    )
    assert parse_sitemap_py(gzip.compress(xml)) == parse_sitemap_py(xml)
    assert len(parse_sitemap_py(gzip.compress(xml))) == 2
    assert parse_sitemap_py(gzip.compress(xml)[:20]) == []  # torn member
    assert parse_sitemap_py(b"\x1f\x8bnot really gzip") == []


def test_anchor_pairs_order_duplicates_and_nesting():
    html = (
        '<html><body><a href="/x">Click <b>me</b> now</a>'
        '<a href="http://b.example/">  </a>'  # whitespace-only anchor -> ''
        '<a href="/x">again</a>'
        '<a href="/unclosed">tail text'  # implicitly closed at EOF
        "</body></html>"
    )
    got = extract_anchors_py(html, "http://a.example/p")
    assert got == [
        {"link": "http://a.example/x", "anchor": "Click me now"},
        {"link": "http://b.example/", "anchor": ""},
        {"link": "http://a.example/x", "anchor": "again"},
        {"link": "http://a.example/unclosed", "anchor": "tail text"},
    ]


def test_anchor_new_a_implicitly_closes_previous():
    html = '<a href="/one">first <a href="/two">second</a>'
    got = extract_anchors_py(html, "http://h.example/")
    assert [(g["link"], g["anchor"]) for g in got] == [
        ("http://h.example/one", "first"),
        ("http://h.example/two", "second"),
    ]


def test_anchor_empty_and_hrefless():
    assert extract_anchors_py(None, "http://h.example/") == []
    assert extract_anchors_py("<a>no href</a>", "http://h.example/") == []


def test_robots_sitemap_directives_are_global():
    txt = (
        "User-agent: special-bot\n"
        "Disallow: /\n"
        "Sitemap: http://h.example/sm-in-group.xml\n"
        "\n"
        "User-agent: *\n"
        "Disallow: /private\n"
        "Sitemap: http://h.example/sm-2.xml\n"
        "Sitemap:\n"  # empty value -> skipped
        "sitemap: http://h.example/sm-lower.xml\n"  # key case-insensitive
    )
    parsed = parse_robots_txt(txt)
    # collected in file order, regardless of agent-group scoping
    assert parsed["sitemaps"] == [
        "http://h.example/sm-in-group.xml",
        "http://h.example/sm-2.xml",
        "http://h.example/sm-lower.xml",
    ]
    # group selection unaffected: '*' group only
    assert parsed["rules"] == [{"allow": False, "prefix": "/private"}]


def test_c4_quality_filter_line_and_page_rules(spark):
    from opps_feedcrawler_spark.functions.textstats import c4_quality_filter

    pages = [
        # 3 clean lines -> kept
        (1, "one two three four five six.\nalpha beta gamma delta eps!\n"
            "aa bb cc dd ee ff?"),
        # short + unpunctuated + javascript lines die; only 1 survivor
        (2, "good line one two three four.\ntoo short.\nno punct here at all\n"
            "please enable javascript to continue."),
        # brace beats lorem in reason precedence
        (3, "one two three four five.\nsix seven eight nine ten!\n"
            "a b c d e f.\nvar x = {\nlorem ipsum dolor sit"),
        (4, "one two three four five.\nsix seven eight nine ten!\n"
            "a b c d e f.\nlorem ipsum dolor sit"),
    ]
    df = spark.createDataFrame(pages, "doc_id int, text string")
    rows = {r.doc_id: r for r in c4_quality_filter(df).collect()}
    assert rows[1].doc_kept and rows[1].n_kept == 3
    assert rows[1].drop_reason is None
    assert rows[2].n_kept == 1
    assert rows[2].drop_reason == "too_few_sentences" and not rows[2].doc_kept
    assert rows[3].drop_reason == "brace"
    assert rows[4].drop_reason == "lorem_ipsum"
    # kept_text preserves line order of survivors
    assert rows[1].kept_text.splitlines()[0] == "one two three four five six."
