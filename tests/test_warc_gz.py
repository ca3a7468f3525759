"""Gzip WARC (.warc.gz) — the actual Common-Crawl wire format (VERDICT r3
#4): record-per-gzip-member framing, member-boundary scan, CDX over
compressed offsets, interop with the plain-WARC parser on the inflated
stream, torn-tail salvage."""

from __future__ import annotations

import gzip
import hashlib
import zlib
from datetime import datetime

from opps_feedcrawler_spark.sources.warc import (
    _GZ_HEADER,
    _gz_member_offsets,
    build_warc_gz_py,
    build_warc_py,
    cdx_index_gz,
    parse_warc_gz_py,
    parse_warc_py,
    read_warc_gz,
    to_warc_gz,
    to_warc_gz_sharded,
)

RECS = [
    ("http://a.example/1", datetime(2024, 3, 1, 0, 0, 5), b"hello"),
    # payload containing both the WARC record terminator AND the gzip
    # magic MUST roundtrip (length-driven parse, framing-driven members)
    ("http://a.example/2", datetime(2024, 3, 1, 0, 1, 0), b"x\r\n\r\n\x1f\x8by"),
    ("http://a.example/3", datetime(2024, 3, 1, 0, 2, 0), b""),
]


def test_gz_member_golden_and_deterministic():
    blob = build_warc_gz_py(RECS[:1])
    # fixed RFC 1952 header: CM=8, FLG=0, MTIME=0, XFL=0, OS=255
    assert blob[:10] == _GZ_HEADER == bytes.fromhex("1f8b08000000000000ff")
    # the single member inflates to exactly the plain-WARC record bytes
    assert gzip.decompress(blob) == build_warc_py(RECS[:1])
    # byte-stable across builds (shard files must be reproducible)
    assert build_warc_gz_py(RECS) == build_warc_gz_py(RECS)


def test_gz_roundtrip_tricky_payloads():
    back = parse_warc_gz_py(build_warc_gz_py(RECS))
    assert [(r["url"], r["warc_date"], r["payload"]) for r in back] == [
        (u, t, p) for u, t, p in RECS
    ]
    assert [r["content_length"] for r in back] == [5, 8, 0]


def test_gz_member_boundaries_contiguous_and_self_contained():
    blob = build_warc_gz_py(RECS)
    members = _gz_member_offsets(blob)
    assert len(members) == 3
    pos = 0
    for off, mlen, inflated in members:
        assert off == pos  # members are back-to-back
        # the compressed slice is a complete standalone gzip stream:
        # range-fetching exactly [off, off+mlen) yields one record
        assert gzip.decompress(blob[off : off + mlen]) == inflated
        recs = parse_warc_py(inflated)
        assert len(recs) == 1
        pos = off + mlen
    assert pos == len(blob)  # no slack bytes between or after members


def test_gz_interop_whole_stream_inflate_matches():
    """Inflating the whole multi-member stream with stdlib gzip and
    feeding it to the PLAIN parser must yield the same records as the
    member-aware reader (the interop check VERDICT r3 #4 asked for)."""
    blob = build_warc_gz_py(RECS)
    via_plain = parse_warc_py(gzip.decompress(blob))
    via_gz = parse_warc_gz_py(blob)
    key = lambda r: (r["url"], r["warc_date"], r["content_length"], r["payload"])  # noqa: E731
    assert [key(r) for r in via_plain] == [key(r) for r in via_gz]


def test_gz_torn_tail_and_garbage_salvage():
    blob = build_warc_gz_py(RECS)
    members = _gz_member_offsets(blob)
    # truncated mid-final-member: the first two records still parse
    torn = blob[: members[2][0] + members[2][1] - 3]
    assert [r["url"] for r in parse_warc_gz_py(torn)] == [
        RECS[0][0],
        RECS[1][0],
    ]
    # corrupt the final member's CRC32 trailer: that member is dropped
    bad = bytearray(blob)
    bad[-5] ^= 0xFF
    assert [r["url"] for r in parse_warc_gz_py(bytes(bad))] == [
        RECS[0][0],
        RECS[1][0],
    ]
    assert parse_warc_gz_py(b"") == []
    assert parse_warc_gz_py(None) == []
    assert parse_warc_gz_py(b"not gzip at all") == []


def test_gz_spark_roundtrip(spark):
    df = spark.createDataFrame(
        RECS, "url string, warc_date timestamp, payload binary"
    )
    back = read_warc_gz(to_warc_gz(df)).collect()
    got = sorted((r.url, r.warc_date, bytes(r.payload)) for r in back)
    assert got == sorted((u, t, p) for u, t, p in RECS)


def test_gz_sharded_cdx_offsets_exact(spark):
    """cdx_index_gz over to_warc_gz_sharded: url-ordered shard
    composition; every (offset, record_length) pair range-fetches a
    standalone gzip member holding exactly its url's record; offsets are
    contiguous and cover the blob; digests are true sha256; the inflated
    length obeys the plain-WARC grammar arithmetic."""
    rows = [
        (
            i // 3,
            f"http://h/{chr(122 - i)}",
            datetime(2024, 3, 1),
            bytes([i]) * (5 + i),
        )
        for i in range(7)
    ]
    df = spark.createDataFrame(
        rows, "shard long, url string, warc_date timestamp, payload binary"
    )
    arch = {r.shard: bytes(r.archive) for r in to_warc_gz_sharded(df).collect()}
    cdx = sorted(
        cdx_index_gz(to_warc_gz_sharded(df)).collect(),
        key=lambda r: (r.shard, r.offset),
    )
    assert len(cdx) == 7
    by_payload = {u: p for _, u, _, p in rows}
    pos = {s: 0 for s in arch}
    for r in cdx:
        blob = arch[r.shard]
        assert r.member_demarcated
        assert r.offset == pos[r.shard]  # contiguous members, url order
        member = blob[r.offset : r.offset + r.record_length]
        recs = parse_warc_py(gzip.decompress(member))
        assert [x["url"] for x in recs] == [r.url]
        assert r.inflated_length == 107 + len(r.url) + len(
            str(len(by_payload[r.url]))
        ) + len(by_payload[r.url])
        assert r.content_length == len(by_payload[r.url])
        assert r.digest == hashlib.sha256(by_payload[r.url]).hexdigest()
        assert r.cdx_ts == "20240301000000"
        pos[r.shard] += r.record_length
    for s, blob in arch.items():
        assert pos[s] == len(blob)
        urls = [r.url for r in cdx if r.shard == s]
        assert urls == sorted(urls)


def test_gz_flg_name_header_tolerated():
    """A conformant .warc.gz written by another tool may set FNAME/FEXTRA
    flag bits — the wbits=31 walk parses those, so the reader is not
    limited to our fixed-header writer."""
    rec = build_warc_py(RECS[:1])
    co = zlib.compressobj(6, zlib.DEFLATED, -zlib.MAX_WBITS)
    body = co.compress(rec) + co.flush()
    fname_member = (
        b"\x1f\x8b\x08\x08\x00\x00\x00\x00\x00\x03"  # FLG=FNAME, OS=unix
        + b"shard-00000.warc\x00"
        + body
        + zlib.crc32(rec).to_bytes(4, "little")
        + (len(rec) & 0xFFFFFFFF).to_bytes(4, "little")
    )
    blob = fname_member + build_warc_gz_py(RECS[1:])
    assert [r["url"] for r in parse_warc_gz_py(blob)] == [u for u, _, _ in RECS]


def test_gz_chunked_walk_spans_chunk_boundaries():
    """The member walk feeds zlib bounded chunks (linear-time over a
    many-member shard); members whose compressed or inflated size
    straddles _GZ_CHUNK must still demarcate exactly."""
    from opps_feedcrawler_spark.sources.warc import _GZ_CHUNK

    ts = datetime(2024, 3, 1, 0, 0, 5)
    recs = [
        # incompressible payload (sha256 counter mode, deterministic)
        # -> compressed member > one chunk
        ("http://big.example/rand", ts,
         b"".join(hashlib.sha256(i.to_bytes(4, "big")).digest()
                  for i in range((_GZ_CHUNK + 70000) // 32))),
        # highly compressible payload -> inflated size >> chunk, tiny member
        ("http://big.example/zeros", ts, b"\x00" * (2 * _GZ_CHUNK + 11)),
        ("http://tail.example/t", ts, b"tail"),
    ]
    blob = build_warc_gz_py(recs)
    members = _gz_member_offsets(blob)
    assert len(members) == 3
    assert members[0][1] > _GZ_CHUNK  # first member really spans a chunk
    pos = 0
    for (off, mlen, inflated), (u, _, p) in zip(members, recs):
        assert off == pos
        assert gzip.decompress(blob[off : off + mlen]) == inflated
        [r] = parse_warc_py(inflated)
        assert (r["url"], r["payload"]) == (u, p)
        pos = off + mlen
    assert pos == len(blob)


from hypothesis import given, settings
from hypothesis import strategies as st


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2**20),
            st.binary(max_size=4096),
        ),
        min_size=0,
        max_size=20,
    ),
    st.integers(min_value=0, max_value=64),
)
@settings(max_examples=200, deadline=None)
def test_gz_walk_roundtrip_and_salvage_property(items, cut):
    """Property: any record set roundtrips through build/parse; truncating
    the blob anywhere salvages exactly the members that end before the
    cut (never a wrong or partial record)."""
    ts = datetime(2024, 3, 1, 0, 0, 5)
    recs = [(f"http://h.example/{i}-{n}", ts, p) for i, (n, p) in enumerate(items)]
    blob = build_warc_gz_py(recs)
    back = parse_warc_gz_py(blob)
    assert [(r["url"], r["payload"]) for r in back] == [
        (u, p) for u, _, p in recs
    ]
    members = _gz_member_offsets(blob)
    ends = [off + mlen for off, mlen, _ in members]
    cut_at = max(0, len(blob) - cut)
    salvaged = parse_warc_gz_py(blob[:cut_at])
    want = sum(1 for e in ends if e <= cut_at)
    assert [(r["url"], r["payload"]) for r in salvaged] == [
        (u, p) for u, _, p in recs[:want]
    ]


def test_fetch_records_gz_roundtrip_and_boundary_failures(spark):
    """fetch_records_gz (VERDICT r4 #3): every CDX (offset,
    record_length) pair fetched from a to_warc_gz_sharded archive
    returns its record byte-identically; request identity is always
    carried through; any boundary perturbation (offset +-1, length -1,
    length +1, zero length, corrupt byte inside the member) yields
    fetch_ok=false with null record fields, never wrong bytes."""
    from pyspark.sql import functions as F

    from opps_feedcrawler_spark.sources.warc import fetch_records_gz

    rows = [
        (
            i // 3,
            f"http://h/{chr(122 - i)}",
            datetime(2024, 3, 1),
            bytes([i]) * (5 + i),
        )
        for i in range(7)
    ]
    df = spark.createDataFrame(
        rows, "shard long, url string, warc_date timestamp, payload binary"
    )
    shards = to_warc_gz_sharded(df)
    cdx = cdx_index_gz(shards)
    good = cdx.select("shard", "offset", "record_length")
    fetched = {
        (r.shard, r.offset): r
        for r in fetch_records_gz(shards, good).collect()
    }
    assert len(fetched) == 7
    by_url = {u: (s, p) for s, u, _, p in rows}
    for r in cdx.collect():
        f = fetched[(r.shard, r.offset)]
        assert f.fetch_ok
        assert f.url == r.url
        assert bytes(f.payload) == by_url[r.url][1]
        assert f.content_length == len(by_url[r.url][1])
        assert f.warc_type == "response"
        assert f.record_length == r.record_length
        assert f.warc_date == datetime(2024, 3, 1)

    # perturbed requests: every one must quarantine, none may raise
    bad = cdx.select(
        "shard",
        (F.col("offset") + 1).alias("offset"),
        F.col("record_length").alias("record_length"),
    ).union(
        cdx.select("shard", "offset", F.col("record_length") - 1)
    ).union(
        cdx.select("shard", "offset", F.col("record_length") + 1)
    ).union(
        cdx.select("shard", "offset", F.lit(0).cast("long"))
    )
    got = fetch_records_gz(shards, bad).collect()
    assert len(got) == 4 * 7
    assert all(not r.fetch_ok and r.payload is None and r.url is None
               for r in got)

    # corrupt one byte INSIDE a member: CRC must catch it
    arch = [
        (r.shard, bytes(r.archive))
        for r in shards.collect()
    ]
    s0, blob0 = arch[0]
    first = cdx.filter(F.col("shard") == s0).orderBy("offset").first()
    corrupt = bytearray(blob0)
    corrupt[first.offset + first.record_length - 5] ^= 0xFF  # in trailer/CRC
    cdf = spark.createDataFrame(
        [(s0, bytes(corrupt))], "shard long, archive binary"
    )
    rq = spark.createDataFrame(
        [(s0, first.offset, first.record_length)],
        "shard long, offset long, record_length long",
    )
    out = fetch_records_gz(cdf, rq).collect()
    assert len(out) == 1 and not out[0].fetch_ok


def test_fetch_records_gz_plan_broadcasts_requests(spark):
    """Plan shape: the request side reaches the shard blobs via a
    BroadcastHashJoin/BroadcastNestedLoop — shard archives never cross an
    exchange (blob plan-shape rule)."""
    from opps_feedcrawler_spark.sources.warc import fetch_records_gz

    df = spark.createDataFrame(
        [(0, "http://h/a", datetime(2024, 3, 1), b"x")],
        "shard long, url string, warc_date timestamp, payload binary",
    )
    shards = to_warc_gz_sharded(df)
    reqs = spark.createDataFrame(
        [(0, 0, 10)], "shard long, offset long, record_length long"
    )
    plan = fetch_records_gz(shards, reqs)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_fetch_records_gz_orphan_shard_and_negative_offset(spark):
    """Review findings (round 5): a request naming a shard with NO
    archive row must still produce its fetch_ok=false row (the inner
    shard join would silently drop it), and a negative offset must not
    alias a valid member via Python end-relative slicing."""
    from pyspark.sql import functions as F  # noqa: F401

    from opps_feedcrawler_spark.sources.warc import fetch_records_gz

    rows = [
        (0, "http://h/a", datetime(2024, 3, 1), b"payload-a"),
        (0, "http://h/b", datetime(2024, 3, 1), b"payload-b"),
    ]
    df = spark.createDataFrame(
        rows, "shard long, url string, warc_date timestamp, payload binary"
    )
    shards = to_warc_gz_sharded(df)
    cdx = cdx_index_gz(shards).collect()
    last = max(cdx, key=lambda r: r.offset)
    shard_len = last.offset + last.record_length
    reqs = spark.createDataFrame(
        [
            (0, int(cdx[0].offset), int(cdx[0].record_length)),  # valid
            (99, 0, int(cdx[0].record_length)),     # shard does not exist
            # negative offset that would alias the LAST member end-wise
            (0, int(last.offset) - shard_len, int(last.record_length)),
        ],
        "shard long, offset long, record_length long",
    )
    out = {(r.shard, r.offset): r for r in fetch_records_gz(shards, reqs).collect()}
    assert len(out) == 3  # one row per request, orphans included
    assert out[(0, cdx[0].offset)].fetch_ok
    assert out[(99, 0)].fetch_ok is False
    assert out[(99, 0)].url is None
    neg = out[(0, last.offset - shard_len)]
    assert neg.fetch_ok is False and neg.payload is None
