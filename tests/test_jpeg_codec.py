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


# ---------------------------------------------------------------------------
# REAL pixel codec (functions/jpegcodec.py): full baseline pipeline.
# Decoder independence: one case decodes a HAND-ASSEMBLED entropy segment
# whose bits were derived on paper from the T.81 canonical-code rules, so
# decoder correctness is not defined by the encoder.
# ---------------------------------------------------------------------------

import numpy as np

from opps_feedcrawler_spark.functions.jpegcodec import (
    FLAT_QT,
    STD_LUMA_QT,
    ZIGZAG,
    decode_jpeg_pixels,
    encode_jpeg_pixels,
)


def test_block_constant_roundtrip_exact():
    rng = np.random.default_rng(11)
    blocks = rng.integers(0, 256, size=(3, 7), dtype=np.uint8)
    img = np.kron(blocks, np.ones((8, 8), dtype=np.uint8))
    out = decode_jpeg_pixels(encode_jpeg_pixels(img, FLAT_QT))
    assert out.shape == (24, 56, 1)
    assert np.array_equal(out[:, :, 0], img)


def test_lossy_roundtrip_bounded_error():
    x = np.linspace(0, 255, 48)
    img = np.clip(np.add.outer(x, x) / 2, 0, 255).astype(np.uint8)
    out = decode_jpeg_pixels(encode_jpeg_pixels(img, STD_LUMA_QT))[:, :, 0]
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.max() <= 12 and err.mean() < 3


def test_flat_qt_near_lossless_on_noise_and_edge_padding():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(17, 23), dtype=np.uint8)  # ragged dims
    out = decode_jpeg_pixels(encode_jpeg_pixels(img, FLAT_QT))[:, :, 0]
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 2


def test_decoder_on_hand_assembled_stream():
    """Constant-133 8x8 image, flat table: DC = 8*(133-128) = 40
    (category 6), all ACs zero. Canonical std-table codes derived by
    hand: DC cat-6 = '1110' (the single length-4 code after 0 len-1,
    1 len-2, 5 len-3 codes), 40 = '101000'; AC EOB = '1010' (4th code:
    len-2 '00','01', len-3 '100', len-4 starts at '1010'). Stream
    '1110 101000 1010' + two 1-pad bits = 0xEA 0x2B."""
    entropy = bytes([0xEA, 0x2B])
    blob = encode_jpeg_pixels(np.full((8, 8), 133, dtype=np.uint8), FLAT_QT)
    # the encoder must have produced exactly this segment (SOS..EOI)
    assert blob.endswith(entropy + b"\xff\xd9")
    out = decode_jpeg_pixels(blob)
    assert np.array_equal(out[:, :, 0], np.full((8, 8), 133))


def test_decoder_trusts_stream_tables_not_constants():
    """Encode with a custom quantization table; the decoder must read it
    from the stream's DQT (natural-order reconstruction from zigzag) to
    reproduce the pixels."""
    qt = np.full(64, 3, dtype=np.int32)
    qt[0] = 1  # keep DC exact for block-constant content
    blocks = np.array([[7, 200], [123, 45]], dtype=np.uint8)
    img = np.kron(blocks, np.ones((8, 8), dtype=np.uint8))
    out = decode_jpeg_pixels(encode_jpeg_pixels(img, qt))
    assert np.array_equal(out[:, :, 0], img)


def test_zigzag_is_the_spec_permutation():
    # spot-check the first and last diagonal entries of the T.81 table
    assert list(ZIGZAG[:10]) == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]
    assert list(ZIGZAG[-6:]) == [61, 54, 47, 55, 62, 63]


def test_decode_rejects_unsupported_modes():
    blob = encode_jpeg_pixels(np.zeros((8, 8), dtype=np.uint8), FLAT_QT)
    progressive = blob.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(NotImplementedError):
        decode_jpeg_pixels(progressive)
    with pytest.raises(ValueError):
        decode_jpeg_pixels(b"\x89PNG not a jpeg")


def test_image_pixel_stats_routes_jpeg(spark):
    from opps_feedcrawler_spark.functions.multimodal import image_pixel_stats

    blocks = np.array([[10, 250, 3]], dtype=np.uint8)
    img = np.kron(blocks, np.ones((8, 8), dtype=np.uint8))
    blob = encode_jpeg_pixels(img, FLAT_QT)
    df = spark.createDataFrame([("j1", blob)], "url string, blob binary")
    (r,) = image_pixel_stats(df).collect()
    assert (r.width, r.height) == (24, 8)
    assert r.sum_px == 64 * (10 + 250 + 3)
    assert (r.min_px, r.max_px) == (3, 250)


def test_resize_image_jpeg_real():
    from opps_feedcrawler_spark.functions.multimodal import resize_image

    blocks = np.arange(16, dtype=np.uint8).reshape(2, 8) * 16
    img = np.kron(blocks, np.ones((8, 8), dtype=np.uint8))  # 16x64
    thumb = resize_image(encode_jpeg_pixels(img, FLAT_QT), 8, 2)
    out = decode_jpeg_pixels(thumb)[:, :, 0]
    # nearest-neighbor floor mapping picks block centers exactly; the
    # re-encode uses the std table but an 8x2 image of constant 8x8 ...
    # -> only partial blocks; tolerance bound instead of exactness
    expect = img[(np.arange(2) * 16) // 2][:, (np.arange(8) * 64) // 8]
    assert np.abs(out.astype(int) - expect.astype(int)).max() <= 16


def test_decoder_skips_standalone_tem_marker():
    """ADVICE r3: a standalone TEM (FF 01) between header segments is
    legal in a conformant stream; the skip was off by one (i = j + 2
    consumed the first byte of the next marker). Insert FF 01 after SOI
    and decode must still succeed bit-exactly."""
    img = np.kron(
        np.array([[10, 250]], dtype=np.uint8), np.ones((8, 8), dtype=np.uint8)
    )
    blob = encode_jpeg_pixels(img, FLAT_QT)
    assert blob[:2] == b"\xff\xd8"
    patched = blob[:2] + b"\xff\x01" + blob[2:]
    out = decode_jpeg_pixels(patched)
    assert np.array_equal(out[:, :, 0], img)
    # multiple standalone markers in a row (TEM then fill-padded TEM)
    patched2 = blob[:2] + b"\xff\x01\xff\xff\x01" + blob[2:]
    assert np.array_equal(decode_jpeg_pixels(patched2)[:, :, 0], img)
