"""Golden tests for the REAL PNG codec (functions/multimodal.py).

The parser is validated against a HAND-SPELLED PNG byte literal (every
byte written out below from the PNG spec, not produced by encode_png), so
parser correctness does not depend on the encoder — and vice versa the
encoder is checked field-by-field against spec offsets plus a zlib
round-trip of its IDAT. This is the independence the stub-era test
lacked."""

from __future__ import annotations

import struct
import zlib

import pytest

from opps_feedcrawler_spark.functions.multimodal import (
    decode_image_meta,
    encode_png,
    parse_png_meta,
)

# A 2x1 grayscale-8 PNG spelled byte-for-byte from the spec:
#   signature, IHDR(len=13, w=2, h=1, depth=8, color=0), IDAT holding the
#   zlib stream of b"\x00\xAB\xCD" (filter 0 + two pixels), IEND.
# CRCs computed here with zlib.crc32 over (type || data) per RFC 2083 —
# the same definition the parser must implement.
_IHDR_DATA = b"\x00\x00\x00\x02\x00\x00\x00\x01\x08\x00\x00\x00\x00"
_IDAT_DATA = zlib.compress(b"\x00\xab\xcd")
HAND_PNG = (
    b"\x89PNG\r\n\x1a\n"
    + b"\x00\x00\x00\x0d" + b"IHDR" + _IHDR_DATA
    + struct.pack(">I", zlib.crc32(b"IHDR" + _IHDR_DATA))
    + struct.pack(">I", len(_IDAT_DATA)) + b"IDAT" + _IDAT_DATA
    + struct.pack(">I", zlib.crc32(b"IDAT" + _IDAT_DATA))
    + b"\x00\x00\x00\x00" + b"IEND"
    + struct.pack(">I", zlib.crc32(b"IEND"))
)


def test_parser_on_hand_spelled_png():
    meta = parse_png_meta(HAND_PNG)
    assert meta == {"width": 2, "height": 1, "bit_depth": 8, "color_type": 0}


def test_parser_rejects_malformed():
    with pytest.raises(ValueError):
        parse_png_meta(b"\xff\xd8not a png")
    with pytest.raises(ValueError):
        parse_png_meta(HAND_PNG[:20])  # truncated inside IHDR
    # flip one IHDR byte -> CRC must catch it
    corrupt = bytearray(HAND_PNG)
    corrupt[18] ^= 0x01  # width byte
    with pytest.raises(ValueError, match="CRC"):
        parse_png_meta(bytes(corrupt))
    # non-IHDR first chunk
    swapped = HAND_PNG[:12] + b"IDAT" + HAND_PNG[16:]
    with pytest.raises(ValueError, match="IHDR"):
        parse_png_meta(swapped)


def test_encoder_fields_at_spec_offsets():
    png = encode_png(300, 7, bytes(range(256)) * 9)
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    # IHDR length/type then big-endian dims at fixed offsets 16/20
    assert png[8:16] == b"\x00\x00\x00\x0dIHDR"
    assert struct.unpack(">I", png[16:20])[0] == 300
    assert struct.unpack(">I", png[20:24])[0] == 7
    assert png[24] == 8 and png[25] == 0  # depth, grayscale
    assert png.endswith(
        b"\x00\x00\x00\x00IEND" + struct.pack(">I", zlib.crc32(b"IEND"))
    )


def test_encoder_idat_zlib_roundtrip():
    payload = bytes((i * 31) & 0xFF for i in range(12))
    png = encode_png(4, 3, payload)
    # walk to IDAT, decompress, check filtered scanlines reproduce payload
    off = 8
    raw = None
    while off < len(png):
        (length,) = struct.unpack(">I", png[off : off + 4])
        ctype = png[off + 4 : off + 8]
        data = png[off + 8 : off + 8 + length]
        assert struct.unpack(">I", png[off + 8 + length : off + 12 + length])[
            0
        ] == zlib.crc32(ctype + data), "chunk CRC"
        if ctype == b"IDAT":
            raw = zlib.decompress(data)
        off += 12 + length
    assert raw == b"".join(
        b"\x00" + payload[r * 4 : (r + 1) * 4] for r in range(3)
    )


def test_encode_parse_roundtrip_sweep():
    for w, h in [(1, 1), (2, 3), (64, 48), (640, 2)]:
        meta = parse_png_meta(encode_png(w, h, b"\x10" * (w * h)))
        assert (meta["width"], meta["height"]) == (w, h)


def test_decode_image_meta_png_is_real():
    png = encode_png(17, 5, b"\x01" * 85)
    m = decode_image_meta(png)
    assert (m["format"], m["width"], m["height"]) == ("png", 17, 5)
    assert m["n_bytes"] == len(png)
    # non-PNG still routes to the declared stub path
    assert decode_image_meta(b"\xff\xd8\xff\xe0rest")["format"] == "jpeg"


def test_fixture_parquet_matches_formula(tmp_path, monkeypatch):
    """The driver fixture's bytes parse back to the formula dims, and the
    file is regenerated deterministically (same bytes) from scratch."""
    import opps_feedcrawler_spark.sources.fixtures as fx

    target = tmp_path / "png-fixture.parquet"
    monkeypatch.setattr(fx, "PNG_FIXTURE_PATH", str(target))
    p1 = fx.ensure_png_fixture()
    import pyarrow.parquet as pq

    t = pq.read_table(p1)
    assert t.num_rows >= 5000
    ids = t.column("doc_id").to_pylist()
    blobs = t.column("png").to_pylist()
    for doc_id, blob in list(zip(ids, blobs))[:50] + [(ids[-1], blobs[-1])]:
        meta = parse_png_meta(blob)
        assert (meta["width"], meta["height"]) == fx.png_dims(doc_id)
    data1 = target.read_bytes()
    target.unlink()
    fx.ensure_png_fixture()
    assert target.read_bytes() == data1
