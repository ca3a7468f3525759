"""Golden-file extraction suite (SURVEY.md §5.1): fixture feeds/pages with
pinned outputs. The text goldens are compared with ``bytes ==`` — the
"byte-identical extracted text per url" invariant (BASELINE.json:16) — and
the comparison runs BOTH through the pure functions and through the
Arrow-batched UDF path, so the Spark boundary cannot drift from the spec.

Golden provenance: fixtures hand-written to cover entity decoding, RFC-822
timezone offsets (normalized to UTC), guid→link fallback, missing fields,
rel=alternate link choice, boilerplate subtrees, whitespace collapsing,
relative-link resolution and first-wins link dedup; outputs inspected and
pinned 2026-08-17.
"""

from __future__ import annotations

import json
import os

import pytest

from opps_feedcrawler_spark.functions.extract import (
    extract_all_py,
    extract_entries_py,
    extract_links_py,
    extract_text_py,
)

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")
BASE_URL = "http://g.example/dir/page"
FIXTURES = ("feed_rss.xml", "feed_atom.xml", "page.html")


def _raw(name: str) -> bytes:
    with open(os.path.join(GOLDEN, name), "rb") as f:
        return f.read()


def _expected() -> dict:
    with open(os.path.join(GOLDEN, "expected.json")) as f:
        return json.load(f)


@pytest.mark.parametrize("name", FIXTURES)
def test_text_byte_identical(name):
    stem = name.rsplit(".", 1)[0]
    with open(os.path.join(GOLDEN, f"{stem}.text.golden"), "rb") as f:
        golden = f.read()
    assert extract_text_py(_raw(name)).encode("utf-8") == golden  # bytes ==


@pytest.mark.parametrize("name", FIXTURES)
def test_links_match_golden(name):
    assert extract_links_py(_raw(name), BASE_URL) == _expected()[name]["links"]


@pytest.mark.parametrize("name", FIXTURES)
def test_entries_match_golden(name):
    got = [
        {
            k: (v.isoformat() if hasattr(v, "isoformat") else v)
            for k, v in e.items()
        }
        for e in extract_entries_py(_raw(name))
    ]
    assert got == _expected()[name]["entries"]


@pytest.mark.parametrize("name", FIXTURES)
def test_fused_parse_matches_goldens(name):
    text, links, _entries = extract_all_py(_raw(name), BASE_URL)
    stem = name.rsplit(".", 1)[0]
    with open(os.path.join(GOLDEN, f"{stem}.text.golden"), "rb") as f:
        assert text.encode("utf-8") == f.read()
    assert links == _expected()[name]["links"]


def test_udf_path_byte_identical(spark):
    """The Arrow/UDF boundary must not alter a single byte vs the goldens."""
    from pyspark.sql import functions as F

    from opps_feedcrawler_spark.functions.extract import extract_text_udf

    rows = [(n, _raw(n)) for n in FIXTURES]
    df = spark.createDataFrame(rows, "name string, html binary")
    got = {
        r.name: r.text
        for r in df.select(
            "name", extract_text_udf(F.col("html")).alias("text")
        ).collect()
    }
    for name in FIXTURES:
        stem = name.rsplit(".", 1)[0]
        with open(os.path.join(GOLDEN, f"{stem}.text.golden"), "rb") as f:
            assert got[name].encode("utf-8") == f.read(), name
