"""Golden tests for the REAL JPEG header codec (functions/multimodal.py).

Same independence discipline as test_png_codec: the parser is validated
against a HAND-SPELLED JPEG byte literal (markers written out below from
ITU T.81's segment syntax, not produced by encode_jpeg), and the encoder
is checked field-by-field against the spec offsets its canonical layout
pins — so neither side's correctness depends on the other."""

from __future__ import annotations

import struct

import pytest

from opps_feedcrawler_spark.functions.multimodal import (
    decode_image_meta,
    encode_jpeg,
    parse_jpeg_meta,
)

# A minimal JPEG spelled marker-by-marker: SOI, a COM segment (so the
# walker must SKIP a non-SOF segment by its length), SOF0 for a 640x480
# 8-bit 3-component frame, EOI. Dimensions in SOF are (height, width) BE.
HAND_JPEG = (
    b"\xff\xd8"                                   # SOI
    + b"\xff\xfe" + struct.pack(">H", 2 + 5) + b"hello"   # COM, len 7
    + b"\xff\xc0" + struct.pack(">H", 2 + 15)     # SOF0, len 17
    + bytes([8])                                  # precision
    + struct.pack(">HH", 480, 640)                # height, width
    + bytes([3])                                  # 3 components
    + bytes([1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1])  # component specs
    + b"\xff\xd9"                                 # EOI
)


def test_parser_on_hand_spelled_jpeg():
    meta = parse_jpeg_meta(HAND_JPEG)
    assert meta["width"] == 640
    assert meta["height"] == 480
    assert meta["precision"] == 8
    assert meta["n_components"] == 3
    assert meta["progressive"] is False


def test_parser_progressive_sof2_and_fill_bytes():
    # fill bytes (extra 0xFF) before a SOF2 marker are legal (B.1.1.2)
    blob = (
        b"\xff\xd8"
        + b"\xff\xff\xff\xc2" + struct.pack(">H", 2 + 9)
        + bytes([8]) + struct.pack(">HH", 7, 9) + bytes([1, 1, 0x11, 0])
        + b"\xff\xd9"
    )
    meta = parse_jpeg_meta(blob)
    assert (meta["width"], meta["height"]) == (9, 7)
    assert meta["progressive"] is True


def test_parser_rejects_malformed():
    with pytest.raises(ValueError):
        parse_jpeg_meta(b"\x89PNG\r\n\x1a\nnot a jpeg")
    with pytest.raises(ValueError):
        parse_jpeg_meta(HAND_JPEG[:8])  # truncated inside COM
    # SOS before any SOF frame header
    bad = (
        b"\xff\xd8"
        + b"\xff\xda" + struct.pack(">H", 2 + 6) + bytes([1, 1, 0, 0, 63, 0])
        + b"\xff\xd9"
    )
    with pytest.raises(ValueError):
        parse_jpeg_meta(bad)
    # segment length overruns the blob
    with pytest.raises(ValueError):
        parse_jpeg_meta(b"\xff\xd8" + b"\xff\xfe" + struct.pack(">H", 9999))


class TestEncoderAgainstSpecOffsets:
    def test_canonical_layout_fields(self):
        blob = encode_jpeg(321, 123, b"payload")
        assert blob[:2] == b"\xff\xd8"
        # APP0 at byte 2: FFE0, len 16, "JFIF\0"
        assert blob[2:4] == b"\xff\xe0"
        assert struct.unpack(">H", blob[4:6])[0] == 16
        assert blob[6:11] == b"JFIF\x00"
        # DQT at byte 20 (2 + 18): FFDB, len 67
        assert blob[20:22] == b"\xff\xdb"
        assert struct.unpack(">H", blob[22:24])[0] == 67
        # SOF0 at byte 89 (20 + 69): FFC0; height at 94, width at 96
        assert blob[89:91] == b"\xff\xc0"
        assert struct.unpack(">H", blob[94:96])[0] == 123
        assert struct.unpack(">H", blob[96:98])[0] == 321
        assert blob.endswith(b"\xff\xd9")

    def test_byte_stuffing_keeps_stream_parseable(self):
        # an entropy payload full of 0xFF must not alias a marker: the
        # encoder stuffs 0xFF -> 0xFF 0x00, and the parser still finds
        # SOF (it stops before the entropy stream)
        blob = encode_jpeg(5, 4, b"\xff" * 64)
        meta = parse_jpeg_meta(blob)
        assert (meta["width"], meta["height"]) == (5, 4)
        assert b"\xff\xd8" not in blob[2:-2].replace(b"\xff\x00", b"")[2:]

    def test_roundtrip_sweep(self):
        for w, h in [(1, 1), (65535, 1), (320, 240), (17, 4093)]:
            meta = parse_jpeg_meta(encode_jpeg(w, h, b"x" * 9))
            assert (meta["width"], meta["height"]) == (w, h)

    def test_rejects_bad_dims(self):
        with pytest.raises(ValueError):
            encode_jpeg(0, 5, b"")
        with pytest.raises(ValueError):
            encode_jpeg(5, 70000, b"")


def test_decode_image_meta_dispatches_jpeg_for_real():
    blob = encode_jpeg(64, 32, b"abc")
    meta = decode_image_meta(blob)
    assert meta["format"] == "jpeg"
    # REAL dims from SOF0, not the old n_bytes-derived stub formula
    assert (meta["width"], meta["height"]) == (64, 32)
    assert meta["n_bytes"] == len(blob)
