"""WET (WARC-encapsulated extracted text) — the derived text format Common
Crawl publishes next to every WARC shard: conversion-type records, grammar
arithmetic (the oracle-facing WET_FIXED constant), parser interop, sharded
write + CDX offsets."""

from __future__ import annotations

from datetime import datetime

from opps_feedcrawler_spark.sources.warc import (
    WAT_FIXED,
    WET_FIXED,
    _parse_warc_offsets,
    build_revisit_py,
    build_warc_py,
    build_wat_py,
    build_wet_py,
    cdx_index,
    parse_warc_py,
    read_warc,
    to_wet_sharded,
)

RECS = [
    ("http://a.example/1", datetime(2024, 3, 1, 0, 0, 5), b"extracted text"),
    # payload containing the record terminator MUST roundtrip (the parse
    # is length-driven, never delimiter-split)
    ("http://a.example/2", datetime(2024, 3, 1, 0, 1, 0), b"x\r\n\r\ny"),
    ("http://a.example/3", datetime(2024, 3, 1, 0, 2, 0), b""),
]


def test_wet_golden_bytes():
    blob = build_wet_py(RECS[:1])
    assert blob == (
        b"WARC/1.0\r\n"
        b"WARC-Type: conversion\r\n"
        b"WARC-Target-URI: http://a.example/1\r\n"
        b"WARC-Date: 2024-03-01T00:00:05Z\r\n"
        b"Content-Type: text/plain\r\n"
        b"Content-Length: 14\r\n"
        b"\r\n"
        b"extracted text"
        b"\r\n\r\n"
    )


def test_wet_fixed_constant_pins_grammar_arithmetic():
    """WET_FIXED is what oracle SQL predicts offsets with — pin it against
    the real serializer for every record, including empty payloads and
    multi-digit Content-Length values."""
    recs = RECS + [
        ("http://bb.example/xyz", datetime(2024, 3, 1), b"q" * 12345)
    ]
    blob = build_wet_py(recs)
    pos = 0
    for r, parsed in zip(recs, _parse_warc_offsets(blob)):
        url, _ts, payload = r
        rec_len = WET_FIXED + len(url) + len(str(len(payload))) + len(payload)
        assert parsed["offset"] == pos
        assert parsed["url"] == url and parsed["payload"] == payload
        pos += rec_len
    assert pos == len(blob)


def test_wat_golden_bytes_and_fixed_constant():
    payload = b'{"links":["http://b/"],"url":"http://a/"}'
    blob = build_wat_py([("http://a/", datetime(2024, 3, 1, 0, 0, 5), payload)])
    assert blob == (
        b"WARC/1.0\r\n"
        b"WARC-Type: metadata\r\n"
        b"WARC-Target-URI: http://a/\r\n"
        b"WARC-Date: 2024-03-01T00:00:05Z\r\n"
        b"Content-Type: application/json\r\n"
        b"Content-Length: 41\r\n"
        b"\r\n" + payload + b"\r\n\r\n"
    )
    assert len(blob) == WAT_FIXED + len("http://a/") + len("41") + len(payload)
    back = parse_warc_py(blob)
    assert back[0]["url"] == "http://a/" and back[0]["payload"] == payload


def test_revisit_golden_and_mixed_archive_walk():
    """Revisit records (ISO 28500 §6.7.2): zero payload + payload-digest
    header; a mixed response/revisit archive walks cleanly with types
    and digests surfaced per record."""
    ts = datetime(2024, 3, 2, 0, 0, 5)
    rev = build_revisit_py([("http://a/", ts, "sha256:abc123")])
    assert rev == (
        b"WARC/1.0\r\n"
        b"WARC-Type: revisit\r\n"
        b"WARC-Target-URI: http://a/\r\n"
        b"WARC-Date: 2024-03-02T00:00:05Z\r\n"
        b"WARC-Payload-Digest: sha256:abc123\r\n"
        b"Content-Length: 0\r\n"
        b"\r\n"
        b"\r\n\r\n"
    )
    mixed = build_warc_py([("http://b/", ts, b"new body")]) + rev
    recs = _parse_warc_offsets(mixed)
    assert [(r["url"], r["warc_type"], r["content_length"]) for r in recs] == [
        ("http://b/", "response", 8),
        ("http://a/", "revisit", 0),
    ]
    assert recs[0]["payload_digest"] is None
    assert recs[1]["payload_digest"] == "sha256:abc123"
    # the plain reader contract is unchanged by the typed fields
    assert set(parse_warc_py(mixed)[0]) == {
        "url", "warc_date", "content_length", "payload",
    }


def test_wet_parses_with_type_agnostic_walk():
    """The plain-WARC record walk reads WET unchanged (Content-Type and
    WARC-Type are just extension headers to it)."""
    back = parse_warc_py(build_wet_py(RECS))
    assert [(r["url"], r["warc_date"], r["payload"]) for r in back] == RECS


def test_wet_sharded_cdx_offsets_exact(spark):
    """to_wet_sharded packs url-ordered deterministic shards; cdx_index
    offsets over them equal the WET grammar prefix sums."""
    rows = [
        (i % 2, f"http://h{i:02d}.example/doc", datetime(2024, 3, 1), b"t" * i)
        for i in range(8)
    ]
    df = spark.createDataFrame(
        rows, "shard long, url string, warc_date timestamp, payload binary"
    )
    shards = {r.shard: bytes(r.archive) for r in to_wet_sharded(df).collect()}
    cdx = {
        (r.shard, r.url): r for r in cdx_index(to_wet_sharded(df)).collect()
    }
    for shard in (0, 1):
        expect_off = 0
        for i in sorted(i for i in range(8) if i % 2 == shard):
            url = f"http://h{i:02d}.example/doc"
            rec_len = WET_FIXED + len(url) + len(str(i)) + i
            row = cdx[(shard, url)]
            assert row.offset == expect_off
            assert row.record_length == rec_len
            expect_off += rec_len
        assert expect_off == len(shards[shard])
    # round-trips through the generic reader too
    back = read_warc(to_wet_sharded(df).select("archive")).collect()
    assert sorted((r.url, bytes(r.payload)) for r in back) == sorted(
        (u, p) for (_s, u, _t, p) in rows
    )
