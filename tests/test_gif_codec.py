"""REAL GIF codec (functions/gifcodec.py): GIF is lossless, so ANY
content must round-trip bit-exactly; the decoder is additionally
validated on a HAND-ASSEMBLED stream whose LZW codes were packed by
hand from the spec's LSB-first variable-width rule."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from opps_feedcrawler_spark.functions.gifcodec import (
    _lzw_compress,
    _lzw_decompress,
    decode_gif_pixels,
    encode_gif,
    parse_gif_meta,
)


def test_lzw_roundtrip_matrix():
    rng = np.random.default_rng(9)
    cases = [
        b"",
        b"\x00",
        b"abcabcabcabc" * 40,          # repetitive: table growth
        bytes(range(256)) * 4,          # ramp
        rng.integers(0, 256, 70_000, dtype=np.uint8).tobytes(),  # reset path
    ]
    for d in cases:
        assert _lzw_decompress(_lzw_compress(d, 8), 8, len(d)) == d


def test_kwkwk_special_case():
    # 'aaaa' triggers code-not-yet-in-table (KwKwK) on decode
    d = b"\x61" * 10
    assert _lzw_decompress(_lzw_compress(d, 8), 8, 10) == d


def test_gif_roundtrip_bit_exact_any_content():
    rng = np.random.default_rng(21)
    for w, h in [(1, 1), (31, 23), (64, 48), (255, 3)]:
        img = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
        out = decode_gif_pixels(encode_gif(w, h, img.tobytes()))
        assert np.array_equal(out[:, :, 0], img), (w, h)


def test_meta_fields_and_block_walk():
    blob = encode_gif(17, 5, bytes(85), delay_cs=250)
    m = parse_gif_meta(blob)
    assert m == {
        "version": "GIF89a", "width": 17, "height": 5,
        "n_frames": 1, "duration_cs": 250,
    }
    with pytest.raises(ValueError):
        parse_gif_meta(b"NOTAGIF")
    with pytest.raises(ValueError):
        parse_gif_meta(blob[:-1])  # trailer gone


def test_decoder_on_hand_assembled_stream():
    """2x1 image, pixels [3, 5]: codes CLEAR(256) 3 5 EOI(257) at width
    9, packed LSB-first = acc 256 | 3<<9 | 5<<18 | 257<<27 over 36 bits.
    The GIF wrapper (screen descriptor, grayscale GCT, image descriptor)
    is spelled field-by-field from the spec."""
    acc = 256 | (3 << 9) | (5 << 18) | (257 << 27)
    lzw = acc.to_bytes(5, "little")
    palette = bytes(v for i in range(256) for v in (i, i, i))
    blob = (
        b"GIF89a"
        + struct.pack("<HH", 2, 1) + bytes([0xF7, 0, 0])
        + palette
        + b"\x2c" + struct.pack("<HHHH", 0, 0, 2, 1) + b"\x00"
        + bytes([8])                      # min code size
        + bytes([len(lzw)]) + lzw + b"\x00"
        + b"\x3b"
    )
    out = decode_gif_pixels(blob)
    assert out[:, :, 0].tolist() == [[3, 5]]
    # and the encoder produces the same entropy bytes for the same pixels
    enc = encode_gif(2, 1, bytes([3, 5]))
    assert lzw in enc


def test_animated_gif_meta_and_first_frame():
    from opps_feedcrawler_spark.functions.gifcodec import encode_animated_gif

    rng = np.random.default_rng(4)
    frames = [
        rng.integers(0, 256, 15, dtype=np.uint8).tobytes() for _ in range(3)
    ]
    blob = encode_animated_gif(5, 3, frames, [10, 20, 35])
    m = parse_gif_meta(blob)
    assert m == {
        "version": "GIF89a", "width": 5, "height": 3,
        "n_frames": 3, "duration_cs": 65,
    }
    # first-frame pixel decode still works on multi-frame streams
    out = decode_gif_pixels(blob)
    assert out.reshape(-1).tobytes() == frames[0]
    with pytest.raises(ValueError):
        encode_animated_gif(5, 3, frames, [10, 20])  # length mismatch
    with pytest.raises(ValueError):
        encode_animated_gif(5, 3, [], [])


def test_gif_metadata_stage_quarantines(spark):
    from opps_feedcrawler_spark.functions.gifcodec import encode_animated_gif
    from opps_feedcrawler_spark.functions.multimodal import gif_metadata

    good = encode_animated_gif(4, 2, [bytes(8), bytes(8)], [5, 6])
    df = spark.createDataFrame(
        [("u1", bytearray(good)), ("u2", bytearray(b"GIF89a\x01"))],
        "url string, blob binary",
    )
    rows = {r["url"]: r.asDict() for r in gif_metadata(df).collect()}
    assert rows["u1"]["n_frames"] == 2 and rows["u1"]["duration_cs"] == 11
    assert rows["u2"]["version"] == "invalid" and rows["u2"]["n_frames"] == 0


def test_decode_image_meta_and_pixels_route_gif():
    from opps_feedcrawler_spark.functions.multimodal import (
        decode_image_meta,
        decode_image_pixels,
    )

    blob = encode_gif(9, 4, bytes(range(36)), delay_cs=7)
    m = decode_image_meta(blob)
    assert (m["format"], m["width"], m["height"], m["n_frames"]) == ("gif", 9, 4, 1)
    px = decode_image_pixels(blob)
    assert px.shape == (4, 9, 1) and px.reshape(-1).tolist() == list(range(36))
    bad = decode_image_meta(b"GIF89a" + b"\x01\x02")
    assert bad["format"] == "invalid"


def test_resize_image_gif_real():
    from opps_feedcrawler_spark.functions.multimodal import resize_image

    img = np.kron(
        np.arange(8, dtype=np.uint8).reshape(2, 4) * 30,
        np.ones((8, 8), dtype=np.uint8),
    )  # 16x32
    thumb = resize_image(encode_gif(32, 16, img.tobytes()), 4, 2)
    out = decode_gif_pixels(thumb)[:, :, 0]
    expect = img[(np.arange(2) * 16) // 2][:, (np.arange(4) * 32) // 4]
    # GIF is lossless: nearest-neighbor picks survive re-encode exactly
    assert np.array_equal(out, expect)
