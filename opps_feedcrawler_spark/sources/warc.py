"""WARC archive format — serialize / parse (round 3).

WARC (ISO 28500, public; the format every large web crawl — e.g.
Common Crawl — publishes in) stores a crawl as a concatenation of
records: a header block of CRLF-separated `Name: value` lines ending in
a blank line, then exactly `Content-Length` payload octets, then a
CRLF CRLF record terminator. Because the payload length is declared,
payloads may contain anything (including "\\r\\n\\r\\n") — a correct
parser MUST read the declared length instead of splitting on
delimiters, and ours does.

Spark shape: `to_warc` packs each Arrow batch of records into ONE
archive blob via ``mapInPandas`` (no shuffle — archives are built where
the records already are, exactly how a 1000-executor crawl would write
shard files), and `read_warc` is its inverse. Both ends are pure
functions (`build_warc_py` / `parse_warc_py`) so tests golden-check the
byte format directly.
"""

from __future__ import annotations

import struct
import zlib
from datetime import datetime, timezone
from typing import Callable, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame

WARC_VERSION = b"WARC/1.0"
_CRLF = b"\r\n"

# (url string, warc_date timestamp, payload binary) — the record triple.
RECORD_SCHEMA = (
    "url string, warc_date timestamp, content_length bigint, payload binary"
)
ARCHIVE_SCHEMA = "archive binary, n_records bigint"


def _fmt_date(ts) -> bytes:
    """WARC-Date is W3C ISO-8601 Z-suffixed (ISO 28500 §5.4)."""
    if isinstance(ts, datetime):
        dt = ts
    else:  # pandas.Timestamp
        dt = ts.to_pydatetime()
    if dt.tzinfo is not None:
        dt = dt.astimezone(timezone.utc).replace(tzinfo=None)
    return dt.strftime("%Y-%m-%dT%H:%M:%SZ").encode("ascii")


def build_warc_py(records: Iterable[tuple[str, datetime, bytes]]) -> bytes:
    """Serialize (url, warc_date, payload) triples into one WARC archive."""
    out = bytearray()
    for url, ts, payload in records:
        payload = bytes(payload) if payload is not None else b""
        out += WARC_VERSION + _CRLF
        out += b"WARC-Type: response" + _CRLF
        out += b"WARC-Target-URI: " + url.encode("utf-8") + _CRLF
        out += b"WARC-Date: " + _fmt_date(ts) + _CRLF
        out += b"Content-Length: " + str(len(payload)).encode("ascii") + _CRLF
        out += _CRLF
        out += payload
        out += _CRLF + _CRLF
    return bytes(out)


def parse_warc_py(archive: bytes | None) -> list[dict]:
    """Parse an archive into record dicts; length-driven, never split-based.

    Tolerates header names in any case and unknown header lines (the spec
    allows extension headers). A record missing Content-Length or a
    truncated payload ends parsing (a torn tail file — the part before it
    is still returned, matching how crawl readers salvage partial shards).
    """
    return [
        {k: r[k] for k in ("url", "warc_date", "content_length", "payload")}
        for r in _parse_warc_offsets(archive)
    ]


def _parse_warc_offsets(archive: bytes | None) -> list[dict]:
    """parse_warc_py plus each record's byte offset within the archive —
    the extra field CDX indexing needs."""
    if not archive:
        return []
    buf = bytes(archive)
    out: list[dict] = []
    pos = 0
    n = len(buf)
    while pos < n:
        record_start = pos
        hdr_end = buf.find(_CRLF + _CRLF, pos)
        if hdr_end < 0:
            break
        header_lines = buf[pos:hdr_end].split(_CRLF)
        if not header_lines or not header_lines[0].startswith(b"WARC/"):
            break
        fields: dict[str, str] = {}
        for line in header_lines[1:]:
            name, _, value = line.partition(b":")
            fields[name.strip().lower().decode("ascii", "replace")] = (
                value.strip().decode("utf-8", "replace")
            )
        try:
            length = int(fields["content-length"])
        except (KeyError, ValueError):
            break
        body_start = hdr_end + 4
        if body_start + length > n:
            break
        payload = buf[body_start : body_start + length]
        ts = None
        raw_date = fields.get("warc-date")
        if raw_date:
            try:
                ts = datetime.strptime(raw_date, "%Y-%m-%dT%H:%M:%SZ")
            except ValueError:
                ts = None
        out.append(
            {
                "url": fields.get("warc-target-uri"),
                "warc_date": ts,
                "content_length": length,
                "payload": payload,
                "offset": record_start,
                # extra header fields typed readers need; parse_warc_py
                # filters these out, so its contract is unchanged
                "warc_type": fields.get("warc-type"),
                "payload_digest": fields.get("warc-payload-digest"),
            }
        )
        pos = body_start + length + 4  # skip record terminator CRLF CRLF
    return out


# ---------------------------------------------------------------------------
# WET (WARC Encapsulated Text) — the derived text-extraction format Common
# Crawl publishes alongside its WARC shards: the SAME ISO 28500 record
# grammar, but each record is `WARC-Type: conversion` with a
# `Content-Type: text/plain` payload holding the boilerplate-stripped text
# of one page. Replay/indexing tooling is shared with WARC (the record walk
# is type-agnostic), which is why to_wet reuses the sharded writer and
# cdx_index unchanged.
# ---------------------------------------------------------------------------

# Fixed bytes of one WET record outside its three variable parts (url,
# Content-Length digit count, payload): version line 10 + "WARC-Type:
# conversion" 23 + "WARC-Target-URI: " skeleton 19 + date line 33 +
# "Content-Type: text/plain" 26 + "Content-Length: " skeleton 18 + blank
# line 2 + record terminator 4. The constant is load-bearing: oracle SQL
# predicts every record offset from `WET_FIXED + len(url) + digits(L) + L`,
# and test_warc pins it against the real serializer.
WET_FIXED = 135


# WAT (metadata JSON records) shares the same grammar with its own
# type/content-type lines: "WARC-Type: metadata" is 21 bytes with CRLF
# (vs conversion's 23) and "Content-Type: application/json" is 32 (vs
# text/plain's 26), so the fixed skeleton is 135 - 23 - 26 + 21 + 32.
WAT_FIXED = 139


def _build_typed_records(
    records: Iterable[tuple[str, datetime, bytes]],
    warc_type: bytes,
    content_type: bytes,
) -> bytes:
    """Shared serializer for derived-format records (WET conversion, WAT
    metadata): same ISO 28500 length-driven grammar as build_warc_py plus
    a Content-Type header."""
    out = bytearray()
    for url, ts, payload in records:
        payload = bytes(payload) if payload is not None else b""
        out += WARC_VERSION + _CRLF
        out += b"WARC-Type: " + warc_type + _CRLF
        out += b"WARC-Target-URI: " + url.encode("utf-8") + _CRLF
        out += b"WARC-Date: " + _fmt_date(ts) + _CRLF
        out += b"Content-Type: " + content_type + _CRLF
        out += b"Content-Length: " + str(len(payload)).encode("ascii") + _CRLF
        out += _CRLF
        out += payload
        out += _CRLF + _CRLF
    return bytes(out)


def build_wet_py(records: Iterable[tuple[str, datetime, bytes]]) -> bytes:
    """Serialize (url, warc_date, extracted-text payload) triples into one
    WET archive: conversion-type records, text/plain content type, same
    length-driven grammar as build_warc_py."""
    return _build_typed_records(records, b"conversion", b"text/plain")


def build_revisit_py(
    records: Iterable[tuple[str, datetime, str]],
) -> bytes:
    """Serialize (url, warc_date, payload-digest) triples into revisit
    records (`WARC-Type: revisit`, ISO 28500 §6.7.2 — how a recrawl
    stores an UNCHANGED page: zero payload bytes plus a
    `WARC-Payload-Digest` pointing at the prior capture's content).
    This is the record type that makes incremental crawls cheap at
    Common-Crawl scale: re-fetching 10^10 URLs where most pages didn't
    change must not re-store most payloads."""
    out = bytearray()
    for url, ts, digest in records:
        out += WARC_VERSION + _CRLF
        out += b"WARC-Type: revisit" + _CRLF
        out += b"WARC-Target-URI: " + url.encode("utf-8") + _CRLF
        out += b"WARC-Date: " + _fmt_date(ts) + _CRLF
        out += b"WARC-Payload-Digest: " + digest.encode("ascii") + _CRLF
        out += b"Content-Length: 0" + _CRLF
        out += _CRLF
        out += _CRLF + _CRLF
    return bytes(out)


def build_wat_py(records: Iterable[tuple[str, datetime, bytes]]) -> bytes:
    """Serialize (url, warc_date, JSON-metadata payload) triples into one
    WAT archive: metadata-type records, application/json content type —
    the per-page metadata sidecar format Common Crawl publishes (links,
    headers, envelope data as JSON)."""
    return _build_typed_records(records, b"metadata", b"application/json")


def to_wet_sharded(
    records: DataFrame, shard_col: str = "shard", sort_col: str = "url"
) -> DataFrame:
    """(shard, url, warc_date, payload) -> (shard, archive, n_records)
    where archive is a WET file: the text-conversion twin of
    to_warc_sharded, same one-shuffle deterministic-composition contract.
    Payloads are expected to be UTF-8 extracted text; cdx_index /
    read_warc work on the output unchanged (the record walk is
    type-agnostic)."""
    return _to_sharded(records, build_wet_py, shard_col, sort_col)


def to_wat_sharded(
    records: DataFrame, shard_col: str = "shard", sort_col: str = "url"
) -> DataFrame:
    """The WAT twin of to_wet_sharded: one metadata-record archive per
    shard key, payloads expected to be UTF-8 JSON. Same one-shuffle
    deterministic-composition contract; cdx_index / read_warc work on
    the output unchanged."""
    return _to_sharded(records, build_wat_py, shard_col, sort_col)


# ---------------------------------------------------------------------------
# Gzip WARC (.warc.gz) — the actual Common-Crawl wire format: each WARC
# record is its OWN gzip member (RFC 1952 allows member concatenation;
# ISO 28500 Annex + the Common Crawl docs standardize record-per-member so
# replay tools can fetch ONE record with an HTTP range request and inflate
# it standalone). A .warc.gz is therefore NOT one gzip stream over the
# archive — it is len(records) back-to-back members, and the CDX index
# stores each member's compressed (offset, length).
# ---------------------------------------------------------------------------

_GZ_MAGIC = b"\x1f\x8b"
# Fixed RFC 1952 header: magic, CM=8 (deflate), FLG=0 (no name/extra/
# comment), MTIME=0, XFL=0, OS=255 (unknown) — every field pinned so the
# member bytes are a pure function of the payload (resume/replay and the
# cross-parallelism determinism contract need byte-stable shard files).
_GZ_HEADER = b"\x1f\x8b\x08\x00\x00\x00\x00\x00\x00\xff"
# member-walk feed size: big enough that a typical ~10 KB-page member is
# one call, small enough that the per-member unused_data overfeed copy
# stays trivial
_GZ_CHUNK = 1 << 18


def _gzip_member(data: bytes) -> bytes:
    """One deterministic gzip member: fixed header, raw-DEFLATE body
    (level 9), CRC32 + ISIZE trailer. stdlib-zlib only."""
    co = zlib.compressobj(9, zlib.DEFLATED, -zlib.MAX_WBITS)
    body = co.compress(data) + co.flush()
    trailer = struct.pack(
        "<II", zlib.crc32(data) & 0xFFFFFFFF, len(data) & 0xFFFFFFFF
    )
    return _GZ_HEADER + body + trailer


def build_warc_gz_py(records: Iterable[tuple[str, datetime, bytes]]) -> bytes:
    """Serialize record triples into a .warc.gz blob: one gzip member per
    record, each inflating to exactly that record's plain-WARC bytes."""
    out = bytearray()
    for rec in records:
        out += _gzip_member(build_warc_py([rec]))
    return bytes(out)


def _gz_member_offsets(
    blob: bytes | None,
) -> list[tuple[int, int, bytes]]:
    """Walk the gzip members of a .warc.gz blob: (offset, compressed
    length, inflated bytes) per member. Boundaries come from the gzip
    FRAMING itself (zlib wbits=31 consumes exactly one member; its
    ``unused_data`` marks where the next begins) — never from
    writer-recorded lengths, so indexing any conformant .warc.gz works.
    A torn tail member (truncated mid-stream or failing its CRC32/ISIZE
    trailer check, which wbits=31 verifies at eof) ends the walk; the
    prefix is still returned, matching the plain-WARC salvage behavior.
    Members inflate whole here; shard files are size-bounded by
    construction (to_warc_gz_sharded's skew rule), so the working set is
    one record, not one archive.

    The input is fed in bounded chunks off a memoryview: handing zlib the
    whole remaining tail per member (``d.decompress(buf[pos:])``) copies
    that tail TWICE per member — once for the slice, once more because
    ``unused_data`` materializes everything past the stream end — which is
    O(archive_bytes x members) memcpy. A real Common-Crawl shard is ~1 GB
    with ~10^5 members; the chunked feed keeps the walk linear with at
    most one chunk of overfeed surfacing in ``unused_data``."""
    if not blob:
        return []
    buf = bytes(blob)
    view = memoryview(buf)
    pos, n = 0, len(buf)
    out: list[tuple[int, int, bytes]] = []
    while pos < n:
        if buf[pos : pos + 2] != _GZ_MAGIC:
            break
        d = zlib.decompressobj(zlib.MAX_WBITS | 16)
        parts: list[bytes] = []
        fed = 0
        try:
            while not d.eof and pos + fed < n:
                chunk = view[pos + fed : pos + fed + _GZ_CHUNK]
                parts.append(d.decompress(chunk))
                fed += len(chunk)
        except zlib.error:
            break
        if not d.eof:
            break  # truncated tail member
        mlen = fed - len(d.unused_data)
        out.append((pos, mlen, b"".join(parts)))
        pos += mlen
    return out


def parse_warc_gz_py(blob: bytes | None) -> list[dict]:
    """Parse a .warc.gz blob into record dicts — the member walk feeding
    each inflated member through the plain length-driven record parser
    (a member may legally hold >1 record; ours writes exactly one)."""
    out: list[dict] = []
    for _off, _mlen, inflated in _gz_member_offsets(blob):
        out.extend(parse_warc_py(inflated))
    return out


def _to_archive(records: DataFrame, builder: Callable) -> DataFrame:
    def pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if len(b) == 0:
                continue
            blob = builder(zip(b["url"], b["warc_date"], b["payload"]))
            yield pd.DataFrame({"archive": [blob], "n_records": [len(b)]})

    return records.select("url", "warc_date", "payload").mapInPandas(
        pack, ARCHIVE_SCHEMA
    )


def _read_archive(archives: DataFrame, parser: Callable) -> DataFrame:
    def unpack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows: list[dict] = []
            for blob in b["archive"]:
                rows.extend(parser(blob))
            if rows:
                yield pd.DataFrame(rows)

    return archives.select("archive").mapInPandas(unpack, RECORD_SCHEMA)


def to_warc(records: DataFrame) -> DataFrame:
    """(url, warc_date, payload) -> (archive binary, n_records): one
    archive blob per non-empty Arrow batch, built in place (no shuffle)."""
    return _to_archive(records, build_warc_py)


def read_warc(archives: DataFrame) -> DataFrame:
    """(archive binary) -> one row per WARC record — the inverse of
    to_warc; archives stay where they are (narrow map, no shuffle)."""
    return _read_archive(archives, parse_warc_py)


def to_warc_gz(records: DataFrame) -> DataFrame:
    """(url, warc_date, payload) -> (.warc.gz binary, n_records): the
    gzip twin of to_warc — one record-per-member archive per Arrow batch,
    built where the records live (no shuffle)."""
    return _to_archive(records, build_warc_gz_py)


def read_warc_gz(archives: DataFrame) -> DataFrame:
    """(.warc.gz binary) -> one row per WARC record — the reader a user
    points at actual Common-Crawl shard bytes (narrow map, no shuffle)."""
    return _read_archive(archives, parse_warc_gz_py)


SHARD_SCHEMA = "shard bigint, archive binary, n_records bigint"
CDX_SCHEMA = (
    "shard bigint, url string, cdx_ts string, offset bigint, "
    "record_length bigint, digest string"
)


def to_warc_sharded(
    records: DataFrame, shard_col: str = "shard", sort_col: str = "url"
) -> DataFrame:
    """(shard, url, warc_date, payload) -> (shard, archive, n_records):
    ONE archive per shard key, records serialized in ``sort_col`` order —
    the production shard-file write. Unlike to_warc (batch-local, zero
    shuffle, non-deterministic record->file assignment), this pays one
    shuffle on the shard key to buy fixed, reproducible shard
    composition — the property real crawls need (Common Crawl's ~1 GB
    WARC shards) and the property that makes byte offsets verifiable by
    an independent reader. Skew rule: shard keys must be size-bounded by
    construction (e.g. doc_id // N); a giant shard would serialize on
    one task, exactly like any groupBy hot key."""

    return _to_sharded(records, build_warc_py, shard_col, sort_col)


def to_warc_gz_sharded(
    records: DataFrame, shard_col: str = "shard", sort_col: str = "url"
) -> DataFrame:
    """The .warc.gz twin of to_warc_sharded: one record-per-member gzip
    archive per shard key, records serialized in ``sort_col`` order. Same
    one-shuffle / deterministic-composition / size-bounded-shard-key
    contract; the member framing additionally makes every record
    independently range-fetchable, which is why Common Crawl ships this
    exact layout."""
    return _to_sharded(records, build_warc_gz_py, shard_col, sort_col)


def _to_sharded(
    records: DataFrame, builder: Callable, shard_col: str, sort_col: str
) -> DataFrame:
    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(sort_col, kind="mergesort")
        blob = builder(zip(pdf["url"], pdf["warc_date"], pdf["payload"]))
        return pd.DataFrame(
            {
                "shard": [pdf[shard_col].iloc[0]],
                "archive": [blob],
                "n_records": [len(pdf)],
            }
        )

    return records.select(shard_col, "url", "warc_date", "payload").groupBy(
        shard_col
    ).applyInPandas(pack, SHARD_SCHEMA)


def cdx_index(archives: DataFrame) -> DataFrame:
    """(shard, archive) -> one CDX-style index row per WARC record:
    (shard, url, cdx_ts yyyymmddhhmmss, byte offset within the archive,
    full record length, sha256 payload digest) — the index web-archive
    replay tools (pywb / OpenWayback) seek with. Offsets come from the
    REAL length-driven record walk (_parse_warc_offsets), not from
    re-serialization, so indexing any conformant WARC works. Narrow
    mapInPandas: archives are indexed where they live."""
    import hashlib

    def index(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows: list[dict] = []
            for shard, blob in zip(b["shard"], b["archive"]):
                recs = _parse_warc_offsets(blob)
                total = len(blob)
                for i, r in enumerate(recs):
                    end = recs[i + 1]["offset"] if i + 1 < len(recs) else total
                    ts = r["warc_date"]
                    rows.append(
                        {
                            "shard": shard,
                            "url": r["url"],
                            "cdx_ts": (
                                ts.strftime("%Y%m%d%H%M%S") if ts else None
                            ),
                            "offset": r["offset"],
                            "record_length": end - r["offset"],
                            "digest": hashlib.sha256(r["payload"]).hexdigest(),
                        }
                    )
            if rows:
                yield pd.DataFrame(rows)

    return archives.select("shard", "archive").mapInPandas(index, CDX_SCHEMA)


CDX_GZ_SCHEMA = (
    "shard bigint, url string, cdx_ts string, offset bigint, "
    "record_length bigint, inflated_length bigint, content_length bigint, "
    "digest string, member_demarcated boolean"
)

FETCH_GZ_SCHEMA = (
    "shard bigint, offset bigint, record_length bigint, fetch_ok boolean, "
    "url string, warc_date timestamp, content_length bigint, "
    "payload binary, warc_type string, payload_digest string"
)


def fetch_records_gz(archives: DataFrame, requests: DataFrame) -> DataFrame:
    """CDX random-access record fetch (VERDICT r4 #3): given .warc.gz
    shard blobs (shard, archive) and CDX request rows (shard, offset,
    record_length), slice each blob at the compressed
    [offset, offset+record_length), inflate that single gzip member
    standalone, verify its own RFC 1952 CRC32/ISIZE trailer, and return
    the record — the replay-tool read path (pywb's range-request fetch)
    over record-per-member archives.

    One output row per request, request identity (shard, offset,
    record_length) always carried through. fetch_ok=false (all record
    fields null) when the slice is not EXACTLY one whole valid member:
    inflate fails, the trailer check fails, the member ends short of the
    slice (trailing garbage), or the inflated bytes don't parse as a
    WARC record. An off-by-one boundary in either direction therefore
    cannot return bytes silently.

    Plan shape / scale: requests are tiny index rows; archives are ~1 GB
    shards. The requests side is pre-grouped per shard and BROADCAST so
    shard blobs never cross an exchange — ship the request list to the
    data, never the data to the request (on a real cluster this becomes
    an HTTP range request per row; here the slice is the range request).
    Narrow mapInPandas does the slicing where the blob lives."""
    from pyspark.sql import functions as F

    reqs = requests.groupBy("shard").agg(
        F.collect_list(F.struct("offset", "record_length")).alias("_reqs")
    )
    joined = archives.select("shard", "archive").join(
        F.broadcast(reqs), "shard"
    )

    def fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows: list[dict] = []
            for shard, blob, reqlist in zip(
                b["shard"], b["archive"], b["_reqs"]
            ):
                buf = bytes(blob) if blob is not None else b""
                for req in reqlist:
                    off = int(req["offset"])
                    mlen = int(req["record_length"])
                    row = {
                        "shard": shard,
                        "offset": off,
                        "record_length": mlen,
                        "fetch_ok": False,
                        "url": None,
                        "warc_date": None,
                        "content_length": None,
                        "payload": None,
                        "warc_type": None,
                        "payload_digest": None,
                    }
                    # negative offsets must not alias a valid member via
                    # Python's end-relative slicing — reject outright
                    sliced = buf[off : off + mlen] if off >= 0 else b""
                    inflated = None
                    if len(sliced) == mlen and mlen > 0:
                        try:
                            d = zlib.decompressobj(zlib.MAX_WBITS | 16)
                            out = d.decompress(sliced)
                            if d.eof and not d.unused_data:
                                inflated = out
                        except zlib.error:
                            inflated = None
                    if inflated is not None:
                        recs = _parse_warc_offsets(inflated)
                        # our writer puts exactly one record per member; a
                        # foreign member holding >1 returns the first, but
                        # the whole member must parse (no torn tail):
                        # the last record's header + payload + CRLF CRLF
                        # terminator must land exactly at member end
                        whole = False
                        if recs:
                            last = recs[-1]
                            h_end = inflated.find(
                                _CRLF + _CRLF, last["offset"]
                            )
                            whole = (
                                h_end + 4 + last["content_length"] + 4
                                == len(inflated)
                            )
                        if whole:
                            r = recs[0]
                            row.update(
                                fetch_ok=True,
                                url=r["url"],
                                warc_date=r["warc_date"],
                                content_length=r["content_length"],
                                payload=r["payload"],
                                warc_type=r["warc_type"],
                                payload_digest=r["payload_digest"],
                            )
                    rows.append(row)
            if rows:
                yield pd.DataFrame(rows)

    fetched = joined.mapInPandas(fetch, FETCH_GZ_SCHEMA)
    # the shard join is inner, so a request naming a shard with NO
    # archive row (missing/unregistered shard) would otherwise vanish —
    # violating the one-row-per-request contract. Re-attach those as
    # fetch_ok=false rows via a narrow anti-join (index rows only, no
    # blobs move).
    orphans = (
        requests.select("shard", "offset", "record_length")
        .join(archives.select("shard"), "shard", "left_anti")
        .select(
            F.col("shard").cast("bigint"),
            F.col("offset").cast("bigint"),
            F.col("record_length").cast("bigint"),
            F.lit(False).alias("fetch_ok"),
            F.lit(None).cast("string").alias("url"),
            F.lit(None).cast("timestamp").alias("warc_date"),
            F.lit(None).cast("bigint").alias("content_length"),
            F.lit(None).cast("binary").alias("payload"),
            F.lit(None).cast("string").alias("warc_type"),
            F.lit(None).cast("string").alias("payload_digest"),
        )
    )
    return fetched.unionByName(orphans)


def cdx_index_gz(archives: DataFrame) -> DataFrame:
    """(shard, .warc.gz archive) -> one CDX row per gzip member: (url,
    cdx_ts, COMPRESSED byte offset, COMPRESSED member length, inflated
    record length, declared Content-Length, sha256 payload digest,
    member_demarcated). This is the index shape real replay needs over
    .warc.gz shards — offset/length address the gzip member, so a reader
    range-fetches exactly those bytes and inflates one record standalone.

    Offsets come from the member framing walk (_gz_member_offsets), never
    from writer bookkeeping. ``member_demarcated`` is the in-row proof the
    (offset, length) pair is exact: the indexer RE-SLICES the blob at
    [offset, offset+length) and one-shot-inflates the slice with an
    independent zlib call — a boundary off by even one byte fails the
    slice's CRC32/ISIZE trailer check (or leaves trailing garbage) and the
    flag goes false. Narrow mapInPandas; archives indexed where they live."""
    import hashlib

    def index(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows: list[dict] = []
            for shard, blob in zip(b["shard"], b["archive"]):
                buf = bytes(blob) if blob is not None else b""
                for off, mlen, inflated in _gz_member_offsets(buf):
                    try:
                        again = zlib.decompressobj(zlib.MAX_WBITS | 16)
                        sliced = again.decompress(buf[off : off + mlen])
                        demarc = (
                            again.eof
                            and not again.unused_data
                            and sliced == inflated
                        )
                    except zlib.error:
                        demarc = False
                    for r in parse_warc_py(inflated):
                        ts = r["warc_date"]
                        rows.append(
                            {
                                "shard": shard,
                                "url": r["url"],
                                "cdx_ts": (
                                    ts.strftime("%Y%m%d%H%M%S") if ts else None
                                ),
                                "offset": off,
                                "record_length": mlen,
                                "inflated_length": len(inflated),
                                "content_length": r["content_length"],
                                "digest": hashlib.sha256(
                                    r["payload"]
                                ).hexdigest(),
                                "member_demarcated": demarc,
                            }
                        )
            if rows:
                yield pd.DataFrame(rows)

    return archives.select("shard", "archive").mapInPandas(
        index, CDX_GZ_SCHEMA
    )
