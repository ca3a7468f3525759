"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed through mapInPandas (training-data pipeline
plane).

The Spark-side plumbing is REAL and tested — schema, Arrow batch shape,
partition-preserving mapInPandas. Codec status per format:

- **PNG: REAL.** ``parse_png_meta`` is a stdlib-only structural parser
  (8-byte signature, chunk walk, IHDR field extraction, CRC-32
  verification via zlib.crc32) and ``encode_png`` a minimal real encoder
  (grayscale-8, zlib-deflated filtered scanlines) used by tests and the
  driver fixture. No image library needed — width/height/bit-depth are
  plain big-endian bytes at fixed offsets (PNG spec, RFC 2083 §4.1.1).
- **WAV: REAL.** ``parse_wav_meta`` is a stdlib-only RIFF/WAVE chunk
  walker (RIFF+WAVE magic, fmt/data chunk scan, little-endian field
  extraction per the canonical WAVE format) and ``encode_wav`` a minimal
  spec-valid PCM encoder used by tests and the driver fixture.
- **G.711 (a-law/µ-law) WAV: REAL, both directions.** WAVE format tags
  6/7 carry ITU-T G.711 companded telephony audio (the other payload,
  besides PCM, that is pure integer arithmetic — no codec library).
  ``ulaw_to_linear``/``alaw_to_linear`` implement the segment-expansion
  formulas from G.711 Tables 1a/2a; ``linear_to_ulaw``/``linear_to_alaw``
  are the matching midpoint quantizers derived BY CONSTRUCTION from the
  decode tables (single source of truth, so encode∘decode is the
  identity on codes). ``decode_wav_samples`` expands tags 6/7 to linear
  int32 samples.
- **JPEG metadata: REAL.** ``parse_jpeg_meta`` is a stdlib-only marker
  walker (ITU T.81 segment syntax: SOI, length-prefixed segments, SOFn
  frame-header field extraction) and ``encode_jpeg`` a minimal
  structurally-valid JFIF writer (APP0/DQT/SOF0/DHT/SOS with byte-stuffed
  entropy payload) used by tests and the driver fixture. Dimension
  extraction from SOFn is exactly what PIL does for ``Image.size`` — no
  entropy decode needed.
- **MP3 metadata: REAL.** ``parse_mp3_meta`` walks the MPEG-1 Layer III
  frame chain (ID3v2 skip, per-frame header validation, frame lengths
  derived from each frame's own bitrate/samplerate — exact for VBR) and
  ``encode_mp3`` writes spec-valid CBR frame streams for tests/fixtures.
- **MP4 metadata: REAL.** ``parse_mp4_meta`` is an ISO 14496-12 box
  walker (largesize/to-EOF handling, moov→mvhd v0/v1 field layouts,
  trak counting) and ``encode_mp4`` a minimal exact-size BMFF writer.
- **PNG pixels: REAL.** ``decode_png_pixels`` zlib-inflates IDAT and
  applies the full RFC 2083 unfilter set (None/Sub/Up/Average/Paeth,
  byte-exact) for 8- and 16-bit gray/RGB/GA/RGBA; ``resize_png`` does real
  nearest-neighbor thumbnails (decode → resample → re-encode).
- **GIF: REAL, fully** (``functions/gifcodec.py``): GIF89a block walk
  (frame counting, GCE delay summation), variable-width LSB-first LZW
  decode AND encode (width bumps, CLEAR resets, KwKwK), palette lookup,
  nearest-neighbor resize. GIF is lossless, so any content round-trips
  bit-exactly — no codec library involved anywhere.
- **MP4 sample demux: REAL.** ``parse_mp4_samples`` walks each trak's
  stts/stsz/stsc/stco (+mdhd timescale, co64) to per-sample absolute
  offsets/sizes/decode-times — the demuxer traversal ffmpeg performs
  before codec work — and ``encode_mp4_samples`` writes fragmentless
  MP4s with genuine sample tables. ``sample_video_frames`` /
  ``video_frame_stats`` slice the TRUE frame payloads out of mdat and
  hash/reduce them with real timestamps.
- **JPEG/MP3 payload decode, codec-level frame pixels: declared
  stubs.** The container has no libjpeg/ffmpeg; ``decode_image_pixels``
  raises NotImplementedError for non-PNG, and decoding a demuxed frame's
  pixels would need the video codec itself. Swapping a stub for a real
  decoder changes ONE pure function; the distributed plan is already
  correct.

Design for 100 TB of media: binaries never pass through a shuffle — the
decode/feature stage is mapInPandas (narrow, partition-local), metadata-only
columns flow onward, and Arrow batch size is bounded by
spark.sql.execution.arrow.maxRecordsPerBatch (session.py) so a batch of
large blobs cannot blow Python-worker memory.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

IMAGE_META_SCHEMA = (
    "url string, n_bytes long, format string, width int, height int, "
    "n_frames int, sample_hash long"
)

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(
    width: int,
    height: int,
    payload: bytes,
    bit_depth: int = 8,
    color_type: int = 0,
) -> bytes:
    """REAL minimal PNG encoder (stdlib only): truecolor/grayscale at bit
    depth 8 or 16, one IDAT. ``payload`` supplies the sample bytes
    row-major — for depth 16 that is TWO bytes per sample, big-endian
    (RFC 2083 §2.3: sample values are network byte order), for color
    types with >1 channel the channels are interleaved per pixel. Short
    payloads are zero-padded; each scanline gets filter byte 0 (None).
    The output is a spec-valid PNG — correct signature, IHDR with
    big-endian dimensions, zlib-deflated image data, CRC-32 on every
    chunk — independently checkable by any PNG reader."""
    if width <= 0 or height <= 0:
        raise ValueError("PNG dimensions must be positive")
    if bit_depth not in (8, 16):
        raise ValueError("encode_png supports bit depth 8 or 16")
    if color_type not in _PNG_CHANNELS:
        raise ValueError(f"unsupported PNG color type {color_type}")
    stride = width * _PNG_CHANNELS[color_type] * (bit_depth // 8)
    ihdr = struct.pack(
        ">IIBBBBB", width, height, bit_depth, color_type, 0, 0, 0
    )
    raw = b"".join(
        b"\x00" + payload[r * stride : (r + 1) * stride].ljust(stride, b"\x00")
        for r in range(height)
    )
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def encode_png_palette(
    width: int, height: int, indices: bytes, palette: bytes, bit_depth: int = 8
) -> bytes:
    """REAL paletted PNG encoder (stdlib+numpy only): color type 3 with a
    PLTE chunk (flat RGB triples) and per-scanline MSB-first bit-packed
    indices at bit depth 1/2/4/8 (packing never crosses rows, RFC 2083
    §2.3). ``indices`` supplies one palette index per pixel row-major
    (short input zero-padded); filter byte 0 per scanline. Spec-valid and
    CRC'd like encode_png."""
    import numpy as np

    if width <= 0 or height <= 0:
        raise ValueError("PNG dimensions must be positive")
    if bit_depth not in (1, 2, 4, 8):
        raise ValueError("palette bit depth must be 1/2/4/8")
    if len(palette) % 3 or not palette:
        raise ValueError("palette must be non-empty flat RGB triples")
    idx = np.frombuffer(
        indices[: width * height].ljust(width * height, b"\x00"), dtype=np.uint8
    ).reshape(height, width)
    if int(idx.max(initial=0)) >= len(palette) // 3:
        raise ValueError("palette index out of range")
    if bit_depth == 8:
        lines = [idx[r].tobytes() for r in range(height)]
    else:
        per = 8 // bit_depth
        bits = (
            np.unpackbits(idx.reshape(height, width, 1), axis=2)[
                :, :, 8 - bit_depth :
            ]
        ).reshape(height, width * bit_depth)
        lines = [np.packbits(bits[r]).tobytes() for r in range(height)]
        assert all(len(ln) == (width + per - 1) // per for ln in lines)
    raw = b"".join(b"\x00" + ln for ln in lines)
    ihdr = struct.pack(">IIBBBBB", width, height, bit_depth, 3, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"PLTE", palette)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def encode_png_adam7(width: int, height: int, payload: bytes) -> bytes:
    """REAL Adam7-interlaced grayscale-8 PNG encoder (stdlib+numpy only):
    the image is split into the seven RFC 2083 §2.6 passes (each pass a
    standalone filtered sub-image, empty passes omitted), concatenated,
    and deflated into one IDAT; IHDR declares interlace method 1.
    Decoding must reassemble exactly the row-major ``payload`` image —
    the lossless-subspace property the formula oracle checks."""
    import numpy as np

    if width <= 0 or height <= 0:
        raise ValueError("PNG dimensions must be positive")
    img = np.frombuffer(
        payload[: width * height].ljust(width * height, b"\x00"), dtype=np.uint8
    ).reshape(height, width)
    raw = bytearray()
    for x0, y0, xs, ys in _ADAM7:
        sub = img[y0::ys, x0::xs]
        for r in range(sub.shape[0]):
            if sub.shape[1] > 0:
                raw += b"\x00" + sub[r].tobytes()
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 1)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _png_chunk(b"IEND", b"")
    )


def parse_png_meta(blob: bytes) -> dict:
    """REAL PNG structural parser (stdlib only): validates the 8-byte
    signature, requires IHDR as the first chunk (per spec), extracts
    width/height/bit-depth/color-type from their fixed big-endian offsets,
    and verifies the IHDR CRC-32. Raises ValueError on malformed input —
    truncation, bad signature, wrong first chunk, or CRC mismatch."""
    if len(blob) < 33 or blob[:8] != _PNG_SIG:
        raise ValueError("not a PNG: bad signature or truncated")
    length, ctype = struct.unpack(">I4s", blob[8:16])
    if ctype != b"IHDR" or length != 13:
        raise ValueError("not a PNG: first chunk is not a 13-byte IHDR")
    data = blob[16:29]
    (crc,) = struct.unpack(">I", blob[29:33])
    if zlib.crc32(b"IHDR" + data) & 0xFFFFFFFF != crc:
        raise ValueError("PNG IHDR CRC mismatch")
    width, height, bit_depth, color_type = struct.unpack(">IIBB", data[:10])
    return {
        "width": width,
        "height": height,
        "bit_depth": bit_depth,
        "color_type": color_type,
    }


# ITU T.81 Annex K.1 example luminance quantization table (public spec).
_JPEG_STD_LUMA_DQT = bytes(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ]
)

#: SOFn markers carrying a frame header (T.81 Table B.1): C0-C3, C5-C7,
#: C9-CB, CD-CF — i.e. every 0xCn except DHT (C4), JPG (C8), DAC (CC).
_JPEG_SOF_MARKERS = frozenset(
    m for m in range(0xC0, 0xD0) if m not in (0xC4, 0xC8, 0xCC)
)


def _jpeg_segment(marker: int, data: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(data) + 2) + data


def encode_jpeg(width: int, height: int, payload: bytes) -> bytes:
    """REAL minimal JFIF writer (stdlib only): SOI, APP0 (JFIF 1.1), DQT
    (T.81 Annex K luminance table), baseline SOF0 with big-endian
    dimensions and one grayscale component, a minimal DHT, SOS, the
    ``payload`` as byte-stuffed entropy data (0xFF -> 0xFF 0x00 per
    B.1.1.5 so no byte sequence aliases a marker), EOI. Every segment is
    structurally valid per the marker syntax, so any JPEG header parser
    (PIL, exiftool, this module's parse_jpeg_meta) extracts the same
    dimensions; only the entropy stream is synthetic."""
    if not (0 < width <= 0xFFFF and 0 < height <= 0xFFFF):
        raise ValueError("JPEG dimensions must be in 1..65535")
    app0 = b"JFIF\x00" + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1) + b"\x00\x00"
    dqt = b"\x00" + _JPEG_STD_LUMA_DQT
    sof0 = struct.pack(">BHHB", 8, height, width, 1) + bytes([1, 0x11, 0])
    # one DC table with a single 2-bit code for symbol 0
    dht = b"\x00" + bytes([0, 1] + [0] * 14) + b"\x00"
    sos = bytes([1, 1, 0x00, 0, 63, 0])
    stuffed = payload.replace(b"\xff", b"\xff\x00")
    return (
        b"\xff\xd8"
        + _jpeg_segment(0xE0, app0)
        + _jpeg_segment(0xDB, dqt)
        + _jpeg_segment(0xC0, sof0)
        + _jpeg_segment(0xC4, dht)
        + _jpeg_segment(0xDA, sos)
        + stuffed
        + b"\xff\xd9"
    )


def encode_app1_exif(orientation: int, byte_order: str = "II") -> bytes:
    """Build a minimal spec-shaped APP1 Exif segment (marker + length +
    'Exif\\0\\0' + TIFF header + one-entry IFD0 carrying Orientation,
    tag 0x0112 SHORT) in either byte order — the fixture twin of
    _parse_exif_orientation, layout per the public TIFF 6.0 / Exif 2.x
    structure."""
    if byte_order not in ("II", "MM"):
        raise ValueError("byte_order must be 'II' or 'MM'")
    if not 1 <= orientation <= 8:
        raise ValueError("orientation must be 1..8")
    bo = "<" if byte_order == "II" else ">"
    tiff = (
        byte_order.encode()
        + struct.pack(bo + "HI", 42, 8)            # magic, IFD0 at byte 8
        + struct.pack(bo + "H", 1)                 # one IFD entry
        + struct.pack(bo + "HHI", 0x0112, 3, 1)    # Orientation, SHORT, x1
        + struct.pack(bo + "H", orientation) + b"\x00\x00"
        + struct.pack(bo + "I", 0)                 # no next IFD
    )
    payload = b"Exif\x00\x00" + tiff
    return b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload


JPEG_EXIF_SCHEMA = (
    "url string, width int, height int, orientation int, progressive boolean"
)


def jpeg_exif_metadata(
    df: DataFrame, url_col: str = "url", bin_col: str = "blob"
) -> DataFrame:
    """mapInPandas EXIF stage: JPEG blobs in, (dims, EXIF orientation,
    progressive flag) out — the pre-pixel routing pass a crawl corpus
    runs before any image transform (orientation must be applied before
    pixels mean anything; progressive informs decode cost). Orientation
    defaults to 1 (top-left) when the file carries no EXIF, per every
    consumer's convention. Same narrow no-blob-shuffle shape as
    image_metadata; malformed blobs quarantine as zero rows with
    orientation 0."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for b in pdf[bin_col]:
                try:
                    # bytes(None) raises TypeError — a NULL blob (failed
                    # fetch) is routine crawl input and quarantines like
                    # any other malformed row, never a stage failure
                    m = parse_jpeg_meta(bytes(b))
                    rows.append(
                        {
                            "width": m["width"],
                            "height": m["height"],
                            "orientation": m["exif_orientation"] or 1,
                            "progressive": m["progressive"],
                        }
                    )
                except (ValueError, TypeError):
                    rows.append(
                        {"width": 0, "height": 0, "orientation": 0,
                         "progressive": False}
                    )
            out = pd.DataFrame(rows)
            out.insert(0, "url", pdf[url_col].values)
            yield out

    return df.mapInPandas(_decode, JPEG_EXIF_SCHEMA)


def _parse_exif_orientation(payload: bytes) -> int | None:
    """Orientation (tag 0x0112) from an APP1 Exif payload: TIFF header
    (II/MM byte order, magic 42, IFD0 offset) then a 12-byte-entry IFD0
    walk. Returns 1..8, or None when absent/defective — EXIF is
    best-effort metadata on a crawl corpus, never a parse failure."""
    if not payload.startswith(b"Exif\x00\x00"):
        return None
    t = payload[6:]
    if len(t) < 14:
        return None
    if t[:2] == b"II":
        bo = "<"
    elif t[:2] == b"MM":
        bo = ">"
    else:
        return None
    try:
        magic, ifd0 = struct.unpack(bo + "HI", t[2:8])
        if magic != 42 or ifd0 + 2 > len(t):
            return None
        (count,) = struct.unpack(bo + "H", t[ifd0 : ifd0 + 2])
        for e in range(count):
            off = ifd0 + 2 + 12 * e
            if off + 12 > len(t):
                return None
            tag, typ, n_vals = struct.unpack(bo + "HHI", t[off : off + 8])
            if tag == 0x0112 and typ == 3 and n_vals == 1:
                (v,) = struct.unpack(bo + "H", t[off + 8 : off + 10])
                return v if 1 <= v <= 8 else None
    except struct.error:
        return None
    return None


def parse_jpeg_meta(blob: bytes) -> dict:
    """REAL JPEG structural parser (stdlib only): walks the T.81 marker
    stream from SOI — skipping fill bytes, standalone markers (TEM,
    RSTn) and length-prefixed segments — to the first SOFn frame header
    and extracts precision/height/width/component-count from their fixed
    big-endian offsets within it (B.2.2), plus the EXIF Orientation tag
    from any APP1 Exif segment seen on the way (the field every crawled
    phone photo needs applied before its pixels mean anything). This is
    the same header-only extraction image libraries perform for
    ``.size``; no entropy decode is attempted. Raises ValueError on
    malformed input: missing SOI, segment overrun, SOS or EOI before any
    SOF, or truncation."""
    n = len(blob)
    if n < 4 or blob[0:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: missing SOI")
    i = 2
    exif_orientation = None
    while i + 2 <= n:
        if blob[i] != 0xFF:
            raise ValueError(f"JPEG marker expected at offset {i}")
        j = i
        while j + 1 < n and blob[j + 1] == 0xFF:  # fill bytes (B.1.1.2)
            j += 1
        if j + 1 >= n:
            break
        marker = blob[j + 1]
        if marker == 0x01 or 0xD0 <= marker <= 0xD8:  # TEM/RSTn/SOI: bare
            i = j + 2
            continue
        if marker == 0xD9:  # EOI
            break
        if j + 4 > n:
            break
        (seglen,) = struct.unpack(">H", blob[j + 2 : j + 4])
        if seglen < 2 or j + 2 + seglen > n:
            raise ValueError("JPEG segment overruns blob")
        if marker == 0xE1 and exif_orientation is None:
            exif_orientation = _parse_exif_orientation(
                blob[j + 4 : j + 2 + seglen]
            )
        if marker in _JPEG_SOF_MARKERS:
            if seglen < 8:
                raise ValueError("JPEG SOF segment too short")
            precision = blob[j + 4]
            height, width = struct.unpack(">HH", blob[j + 5 : j + 9])
            return {
                "width": width,
                "height": height,
                "precision": precision,
                "n_components": blob[j + 9],
                "progressive": marker == 0xC2,
                "exif_orientation": exif_orientation,
            }
        if marker == 0xDA:
            raise ValueError("JPEG SOS reached before any SOF frame header")
        i = j + 2 + seglen
    raise ValueError("JPEG truncated before SOF")


def decode_image_meta(blob: bytes) -> dict:
    """Image metadata decode. PNG and JPEG are REAL (parse_png_meta —
    structural parse with CRC check; parse_jpeg_meta — T.81 marker walk
    to SOFn); unknown formats fall back to a deterministic declared STUB
    (a real deployment replaces the fallback with PIL.Image.open(...)).

    A blob that *sniffs* as PNG/JPEG but fails its structural parse is
    reported as format "invalid" with zero dimensions instead of raising:
    on a crawl corpus, truncated and mislabeled media are routine and one
    bad blob must not fail a 100 TB stage — the row-level error surface
    (format column) lets the pipeline filter or quarantine them."""
    n = len(blob)
    h = int.from_bytes(blob[:8].ljust(8, b"\0"), "little")
    sniffed = None
    if blob[:8] == _PNG_SIG:
        sniffed = ("png", parse_png_meta)
    elif blob[:2] == b"\xff\xd8":
        sniffed = ("jpeg", parse_jpeg_meta)
    elif blob[:4] == b"GIF8":
        from .gifcodec import parse_gif_meta

        sniffed = ("gif", parse_gif_meta)
    if sniffed is not None:
        fmt, parser = sniffed
        try:
            meta = parser(blob)
        except ValueError:
            return {
                "n_bytes": n,
                "format": "invalid",
                "width": 0,
                "height": 0,
                "n_frames": 0,
                "sample_hash": (h % (1 << 62)),
            }
        return {
            "n_bytes": n,
            "format": fmt,
            "width": meta["width"],
            "height": meta["height"],
            "n_frames": meta.get("n_frames", 1),
            "sample_hash": (h % (1 << 62)),
        }
    # deterministic pseudo-dimensions derived from content, not random
    return {
        "n_bytes": n,
        "format": "unknown",
        "width": 16 + (n % 640),
        "height": 16 + ((n * 7) % 480),
        "n_frames": 1,
        "sample_hash": (h % (1 << 62)),
    }


_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # color_type -> samples/pixel

#: Adam7 pass origins/strides (RFC 2083 §2.6): (xstart, ystart, xstep, ystep)
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def _png_unfilter(raw: bytes, pos: int, hgt: int, stride: int, fdist: int):
    """Unfilter ``hgt`` scanlines of ``stride`` bytes starting at
    raw[pos] — the full RFC 2083 §6 set (None/Sub/Up/Average/Paeth,
    byte-exact integer arithmetic). ``fdist`` is the filter's left-pixel
    byte distance (bytes-per-pixel, min 1 for sub-byte depths). Returns
    ((hgt, stride) uint8 ndarray, position after the region)."""
    import numpy as np

    end = pos + hgt * (1 + stride)
    if end > len(raw):
        raise ValueError("PNG pixel data length mismatch")
    out = np.empty((hgt, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for r in range(hgt):
        line = raw[pos + r * (1 + stride) : pos + (r + 1) * (1 + stride)]
        filt, data = line[0], np.frombuffer(line[1:], dtype=np.uint8).copy()
        if filt == 0:
            cur = data
        elif filt == 2:  # Up
            cur = data + prev
        elif filt in (1, 3, 4):  # Sub / Average / Paeth need a left scan
            cur = data
            ints = cur.astype(np.int32)
            pints = prev.astype(np.int32)
            for i in range(stride):
                a = int(cur[i - fdist]) if i >= fdist else 0
                b = int(pints[i]) if filt != 1 else 0
                if filt == 1:
                    cur[i] = (ints[i] + a) & 0xFF
                elif filt == 3:
                    cur[i] = (ints[i] + (a + b) // 2) & 0xFF
                else:  # Paeth
                    c = int(prev[i - fdist]) if i >= fdist else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    cur[i] = (ints[i] + pred) & 0xFF
                ints[i] = cur[i]
        else:
            raise ValueError(f"unknown PNG filter {filt}")
        out[r] = cur
        prev = out[r]
    return out, end


def _png_unpack_samples(arr, w: int, samples: int, bit_depth: int):
    """(h, stride) filtered-out bytes -> (h, w, samples) sample values.
    Sub-byte depths unpack MSB-first per scanline (packing never crosses
    rows, RFC 2083 §2.3); values are raw sample codes, not yet scaled."""
    import numpy as np

    h = arr.shape[0]
    if bit_depth == 8:
        return arr[:, : w * samples].reshape(h, w, samples)
    if bit_depth == 16:
        # 2-byte big-endian samples (RFC 2083 §2.3 network byte order)
        pairs = arr[:, : w * samples * 2].reshape(h, w * samples, 2)
        vals = (pairs[:, :, 0].astype(np.uint16) << 8) | pairs[:, :, 1]
        return vals.reshape(h, w, samples)
    bits = np.unpackbits(arr, axis=1)[:, : w * samples * bit_depth]
    weights = 1 << np.arange(bit_depth - 1, -1, -1, dtype=np.uint16)
    vals = (
        bits.reshape(h, w * samples, bit_depth).astype(np.uint16) * weights
    ).sum(axis=2)
    return vals.astype(np.uint8).reshape(h, w, samples)


def decode_png_pixels(blob: bytes):
    """REAL PNG pixel decode (stdlib+numpy only): walks chunks collecting
    IDAT (plus PLTE for paletted images), zlib-inflates the filtered
    stream, and unfilters with the full RFC 2083 §6 set. Coverage:
    grayscale at bit depth 1/2/4/8 (sub-byte samples scaled to 8-bit by
    the exact 255/(2^d-1) integer factor), 8-bit RGB/gray+alpha/RGBA,
    and paletted (color type 3) at bit depth 1/2/4/8 resolved through
    PLTE to RGB — both progressive (Adam7, RFC 2083 §2.6: seven
    independently-filtered sub-images scattered back by pass origin and
    stride) and non-interlaced. 16-bit gray/RGB/GA/RGBA decode too:
    2-byte big-endian samples through the same unfilter (filtering is
    byte-wise regardless of depth; fdist = samples*2 bytes). Returns a
    (height, width, channels) ndarray — uint8 for depths <= 8, uint16
    for depth 16 (sample values preserved, not rescaled). Malformed
    input raises ValueError."""
    import numpy as np

    meta = parse_png_meta(blob)
    bit_depth, color_type = meta["bit_depth"], meta["color_type"]
    if color_type in (2, 4, 6) and bit_depth not in (8, 16):
        raise ValueError("invalid bit depth for PNG color type")
    if color_type == 3 and bit_depth == 16:
        raise ValueError("invalid bit depth for PNG color type")
    if color_type == 0 and bit_depth not in (1, 2, 4, 8, 16):
        raise ValueError("invalid bit depth for PNG color type")
    interlace = blob[28]  # IHDR data byte 12 (16 + 12)
    if interlace not in (0, 1):
        raise ValueError(f"unknown PNG interlace method {interlace}")
    w, hgt = meta["width"], meta["height"]
    pos, idat, plte = 8, b"", None
    while pos + 8 <= len(blob):
        (length,) = struct.unpack(">I", blob[pos : pos + 4])
        ctype = blob[pos + 4 : pos + 8]
        if ctype == b"IDAT":
            idat += blob[pos + 8 : pos + 8 + length]
        elif ctype == b"PLTE":
            plte = blob[pos + 8 : pos + 8 + length]
        if ctype == b"IEND":
            break
        pos += 12 + length  # len + type + data + crc
    samples = 1 if color_type == 3 else _PNG_CHANNELS[color_type]
    bits_pp = samples * bit_depth
    fdist = max(1, bits_pp // 8)

    # the filtered-stream size is a pure function of the IHDR fields —
    # compute it BEFORE inflating so corrupt deflate data surfaces as the
    # contractual ValueError (zlib.error must not escape) and the inflate
    # is capped at expected+1 rather than trusting the stream to stop
    def _stride(rw: int) -> int:
        return (rw * bits_pp + 7) // 8

    if interlace == 0:
        expected = hgt * (1 + _stride(w))
    else:
        expected = sum(
            ph * (1 + _stride(pw))
            for x0, y0, xs, ys in _ADAM7
            for pw, ph in [((w - x0 + xs - 1) // xs, (hgt - y0 + ys - 1) // ys)]
            if pw > 0 and ph > 0
        )
    d = zlib.decompressobj()
    try:
        raw = d.decompress(idat, expected + 1)
    except zlib.error as exc:
        raise ValueError(f"PNG IDAT stream corrupt: {exc}") from None
    if len(raw) != expected or not d.eof:
        raise ValueError("PNG pixel data length mismatch")

    def region(p: int, rw: int, rh: int):
        stride = (rw * bits_pp + 7) // 8
        arr, p = _png_unfilter(raw, p, rh, stride, fdist)
        return _png_unpack_samples(arr, rw, samples, bit_depth), p

    if interlace == 0:
        mat, p = region(0, w, hgt)
    else:
        mat = np.zeros(
            (hgt, w, samples),
            dtype=np.uint16 if bit_depth == 16 else np.uint8,
        )
        p = 0
        for x0, y0, xs, ys in _ADAM7:
            pw = (w - x0 + xs - 1) // xs
            ph = (hgt - y0 + ys - 1) // ys
            if pw <= 0 or ph <= 0:
                continue
            sub, p = region(p, pw, ph)
            mat[y0::ys, x0::xs] = sub
    if p != len(raw):
        raise ValueError("PNG pixel data length mismatch")

    if color_type == 3:
        if plte is None or len(plte) % 3:
            raise ValueError("paletted PNG missing a valid PLTE chunk")
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        idx = mat[:, :, 0]
        if int(idx.max(initial=0)) >= pal.shape[0]:
            raise ValueError("PNG palette index out of range")
        return pal[idx]
    if color_type == 0 and bit_depth < 8:
        return (mat.astype(np.uint16) * (255 // ((1 << bit_depth) - 1))).astype(
            np.uint8
        )
    return mat


def decode_image_pixels(blob: bytes):
    """Pixel decode. PNG is REAL (decode_png_pixels — inflate + full
    unfilter; gray 1/2/4/8/16-bit, paletted, GA/RGB/RGBA at 8 and 16
    bits, Adam7), JPEG is REAL (functions/jpegcodec.decode_jpeg_pixels —
    baseline AND progressive, grayscale and 3-component YCbCr with
    chroma upsample + BT.601 convert, restart intervals), and GIF first
    frames are REAL (gifcodec). Output is (H, W, C): uint8, or uint16
    for 16-bit PNGs. Formats without a decoder here (and the remaining
    JPEG modes: lossless, arithmetic, hierarchical) raise
    NotImplementedError (a real deploy swaps in PIL/libvips)."""
    if blob[:8] == _PNG_SIG:
        return decode_png_pixels(blob)
    if blob[:2] == b"\xff\xd8":
        from .jpegcodec import decode_jpeg_pixels

        return decode_jpeg_pixels(blob)
    if blob[:4] == b"GIF8":
        from .gifcodec import decode_gif_pixels

        return decode_gif_pixels(blob)
    raise NotImplementedError(
        "pixel decode for this format requires PIL/libvips; "
        "not available in this environment"
    )


def resize_png(blob: bytes, width: int, height: int) -> bytes:
    """REAL nearest-neighbor thumbnail resize for every PNG shape the
    decoder produces: decode_png_pixels → numpy index-map resample →
    re-encode with the real encode_png at the SAME sample depth and a
    color type matching the decoded channel count (gray / gray+alpha /
    RGB / RGBA; paletted input decodes to RGB and re-encodes as
    truecolor). 16-bit samples stay 16-bit — encode_png takes big-endian
    2-byte samples per RFC 2083 §2.3, so uint16 planes are byte-swapped
    to network order, never truncated to their low byte."""
    import numpy as np

    if width <= 0 or height <= 0:
        raise ValueError("resize dimensions must be positive")
    px = decode_png_pixels(blob)
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[px.shape[2]]
    src_h, src_w = px.shape[:2]
    rows = (np.arange(height) * src_h) // height
    cols = (np.arange(width) * src_w) // width
    resized = px[rows][:, cols]
    if resized.dtype == np.uint16:
        return encode_png(
            width, height, resized.astype(">u2").tobytes(),
            bit_depth=16, color_type=color_type,
        )
    return encode_png(width, height, resized.tobytes(), color_type=color_type)


PIXEL_STATS_SCHEMA = (
    "url string, width int, height int, n_px long, sum_px long, "
    "min_px int, max_px int"
)


def image_pixel_stats(
    df: DataFrame, url_col: str = "url", bin_col: str = "blob"
) -> DataFrame:
    """mapInPandas REAL-pixel stage: decode_image_pixels per blob (PNG
    inflate+unfilter or baseline-JPEG Huffman+IDCT), then numpy
    reductions — the shape of any real brightness/NSFW/quality scorer
    over decoded pixels. Narrow, no blob shuffle, Arrow-bounded batches.
    Strict by contract: feed it blobs already routed/validated by
    image_metadata (format not in {unknown, invalid}) — the metadata
    stage is the crawl-corpus quarantine layer; here a parse error is a
    pipeline bug and raises. Declared CAPABILITY limits are different:
    a CMYK/12-bit/arithmetic-coded JPEG has a perfectly valid SOF, so it
    sails through the metadata gate as format 'jpeg' and only the pixel
    decoder can discover it's outside the supported envelope
    (NotImplementedError). Real corpora contain those, so they
    quarantine to an all-zero stats row (n_px = 0 is unreachable for any
    decoded image — the row-level filter) instead of failing a 100 TB
    stage."""
    import numpy as np

    _zero = {
        "width": 0, "height": 0, "n_px": 0,
        "sum_px": 0, "min_px": 0, "max_px": 0,
    }

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for b in pdf[bin_col]:
                try:
                    px = decode_image_pixels(bytes(b))
                except NotImplementedError:
                    rows.append(dict(_zero))
                    continue
                flat = px.reshape(-1).astype(np.int64)
                rows.append(
                    {
                        "width": px.shape[1],
                        "height": px.shape[0],
                        "n_px": int(flat.size),
                        "sum_px": int(flat.sum()),
                        "min_px": int(flat.min()),
                        "max_px": int(flat.max()),
                    }
                )
            out = pd.DataFrame(rows)
            out.insert(0, "url", pdf[url_col].values)
            yield out

    return df.mapInPandas(_stats, PIXEL_STATS_SCHEMA)


def image_metadata(df: DataFrame, url_col: str = "url", bin_col: str = "blob") -> DataFrame:
    """mapInPandas decode stage: binary in, typed metadata out. Narrow
    (no shuffle); batches bounded by the session's Arrow batch size."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [decode_image_meta(bytes(b)) for b in pdf[bin_col]]
            out = pd.DataFrame(metas)
            out.insert(0, "url", pdf[url_col].values)
            yield out

    return df.mapInPandas(_decode, IMAGE_META_SCHEMA)


GIF_META_SCHEMA = (
    "url string, version string, width int, height int, "
    "n_frames int, duration_cs long"
)


def gif_metadata(df: DataFrame, url_col: str = "url", bin_col: str = "blob") -> DataFrame:
    """mapInPandas animated-GIF accounting stage (functions/gifcodec
    block walk): frame count = image descriptors, duration = sum of GCE
    delays — what a crawler needs to budget animated media. Same narrow
    no-blob-shuffle shape as image_metadata; malformed blobs quarantine
    to version='invalid' rows (crawl corpora routinely carry truncated
    media) rather than failing the stage."""
    from .gifcodec import parse_gif_meta

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for b in pdf[bin_col]:
                try:
                    m = parse_gif_meta(bytes(b))
                    rows.append(
                        {
                            "version": m["version"],
                            "width": m["width"],
                            "height": m["height"],
                            "n_frames": m["n_frames"],
                            "duration_cs": m["duration_cs"],
                        }
                    )
                except ValueError:
                    rows.append(
                        {
                            "version": "invalid",
                            "width": 0,
                            "height": 0,
                            "n_frames": 0,
                            "duration_cs": 0,
                        }
                    )
            out = pd.DataFrame(rows)
            out.insert(0, "url", pdf[url_col].values)
            yield out

    return df.mapInPandas(_decode, GIF_META_SCHEMA)


AUDIO_META_SCHEMA = (
    "url string, n_bytes long, codec string, sample_rate int, "
    "n_channels int, duration_ms long"
)


def encode_wav(
    sample_rate: int,
    n_channels: int,
    payload: bytes,
    bits: int = 16,
    fmt_tag: int = 1,
) -> bytes:
    """REAL minimal RIFF/WAVE encoder (stdlib only): canonical 44-byte
    header (RIFF size, 'WAVE', 16-byte fmt chunk, data chunk) followed by
    the sample payload (truncated to whole frames). fmt_tag 1 = linear
    PCM (8/16-bit); 6 = G.711 a-law, 7 = G.711 µ-law (both 8 bits/sample
    per the WAVE spec). Spec-valid, independently readable by any WAV
    reader (e.g. the stdlib `wave` module)."""
    if fmt_tag in (6, 7):
        bits = 8  # G.711 is defined as 8 bits/sample
    if sample_rate <= 0 or n_channels <= 0 or bits % 8 or fmt_tag not in (1, 6, 7):
        raise ValueError("invalid WAV parameters")
    block_align = n_channels * bits // 8
    data = payload[: (len(payload) // block_align) * block_align]
    byte_rate = sample_rate * block_align
    fmt = struct.pack(
        "<HHIIHH", fmt_tag, n_channels, sample_rate, byte_rate, block_align, bits
    )
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def parse_wav_meta(blob: bytes) -> dict:
    """REAL WAV structural parser (stdlib only): validates RIFF/WAVE
    magic, walks chunks (word-aligned per spec) to the fmt and data
    chunks, extracts the little-endian PCM fields, and derives
    duration_ms = whole_frames * 1000 // sample_rate (exact integer
    arithmetic — mirrored by the SQL oracle). Raises ValueError on
    malformed input."""
    if len(blob) < 12 or blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise ValueError("not a WAV: bad RIFF/WAVE magic or truncated")
    pos, fmt, data_len = 12, None, None
    while pos + 8 <= len(blob):
        cid, clen = blob[pos : pos + 4], struct.unpack("<I", blob[pos + 4 : pos + 8])[0]
        body = blob[pos + 8 : pos + 8 + clen]
        if cid == b"fmt " and clen >= 16:
            if len(body) < 16:
                # declared length outruns the blob (torn download) —
                # struct.error must not escape the ValueError contract
                raise ValueError("WAV fmt chunk truncated")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data_len = len(body)
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if fmt is None or data_len is None:
        raise ValueError("WAV missing fmt or data chunk")
    tag, n_channels, sample_rate, _brate, block_align, bits = fmt
    if block_align <= 0 or sample_rate <= 0 or n_channels <= 0:
        raise ValueError("WAV fmt fields invalid")
    frames = data_len // block_align
    return {
        "sample_rate": sample_rate,
        "n_channels": n_channels,
        "bits": bits,
        "fmt_tag": tag,
        "n_frames": frames,
        "duration_ms": frames * 1000 // sample_rate,
    }


def _g711_tables():
    """Build the 256-entry G.711 decode tables from the segment-expansion
    formulas (ITU-T G.711 Tables 1a/2a, classic telephony formulation in
    16-bit linear range). Pure integer arithmetic — the SQL oracle
    re-derives the exact same expansion per byte.

    µ-law: u = ~b; t = (((u & 0xF) << 3) + 0x84) << ((u >> 4) & 7);
           value = 0x84 - t if sign bit else t - 0x84   (range ±32124)
    a-law: a = b ^ 0x55; seg = (a >> 4) & 7; m = a & 0xF;
           t = m*16+8 if seg==0 else (m*16+264) << (seg-1)
           value = +t if sign bit else -t               (range ±32256)
    """
    import numpy as np

    b = np.arange(256, dtype=np.int64)
    u = 255 - b  # ~b for a uint8
    t = (((u & 0xF) << 3) + 0x84) << ((u >> 4) & 7)
    ulaw = np.where(u >= 128, 0x84 - t, t - 0x84).astype(np.int32)
    a = b ^ 0x55
    seg = (a >> 4) & 7
    m = a & 0xF
    t = np.where(seg == 0, m * 16 + 8, (m * 16 + 264) << np.maximum(seg - 1, 0))
    alaw = np.where(a >= 128, t, -t).astype(np.int32)
    return ulaw, alaw


_ULAW_TABLE, _ALAW_TABLE = _g711_tables()


def ulaw_to_linear(codes):
    """REAL G.711 µ-law expansion: uint8 code array -> int32 linear
    samples (±32124). Vectorized table lookup; the table itself is the
    spec formula (see _g711_tables)."""
    import numpy as np

    return _ULAW_TABLE[np.asarray(codes, dtype=np.uint8)]


def alaw_to_linear(codes):
    """REAL G.711 a-law expansion: uint8 code array -> int32 linear
    samples (±32256)."""
    import numpy as np

    return _ALAW_TABLE[np.asarray(codes, dtype=np.uint8)]


def _g711_encoder(table):
    """Midpoint quantizer derived from a G.711 decode table: a linear
    sample maps to the code whose decoded value is nearest (exact G.711
    segment quantization, since segment decode values ARE the segment
    midpoints). Built by construction from the decode table, so
    encode(decode(code)) == code wherever decode is injective (all a-law
    codes; all µ-law codes except one of the two zero codes 0x7F/0xFF)."""
    import numpy as np

    order = np.argsort(table, kind="stable")
    vals = table[order].astype(np.int64)
    mids = (vals[:-1] + vals[1:]) // 2  # floor-midpoint decision levels

    def encode(samples):
        s = np.asarray(samples, dtype=np.int64)
        # every G.711 step is even, so each floor-midpoint is an exact
        # tie point; side='right' sends a sample ON the decision level to
        # the HIGHER decoded value — deterministic (this is also what
        # resolves µ-law's duplicate zero to 0xFF)
        idx = np.searchsorted(mids, s, side="right")
        return order[idx].astype(np.uint8)

    return encode


linear_to_ulaw = _g711_encoder(_ULAW_TABLE)
linear_to_alaw = _g711_encoder(_ALAW_TABLE)


def decode_wav_samples(blob: bytes):
    """REAL PCM waveform decode (stdlib+numpy): locate the data chunk via
    the same RIFF walk as parse_wav_meta and reinterpret it as samples —
    little-endian int16 (the canonical PCM encoding) or uint8, reshaped
    to (frames, channels). G.711 payloads (fmt tags 6/7) are expanded to
    linear through the real a-law/µ-law tables. Raw PCM *is* the
    waveform, so unlike MP3 this needs no codec library; returns an int32
    array so downstream reductions can't overflow."""
    import numpy as np

    meta = parse_wav_meta(blob)
    bits, chans, tag = meta["bits"], meta["n_channels"], meta["fmt_tag"]
    if tag not in (1, 6, 7):
        raise NotImplementedError("only PCM / G.711 a-law / µ-law WAV supported")
    if tag == 1 and bits not in (8, 16):
        raise NotImplementedError("only 8/16-bit PCM WAV supported")
    if tag in (6, 7) and bits != 8:
        raise ValueError("G.711 WAV must declare 8 bits/sample")
    pos = 12
    data = None
    while pos + 8 <= len(blob):
        cid = blob[pos : pos + 4]
        (clen,) = struct.unpack("<I", blob[pos + 4 : pos + 8])
        if cid == b"data":
            data = blob[pos + 8 : pos + 8 + clen]
            break
        pos += 8 + clen + (clen & 1)
    if data is None:
        raise ValueError("WAV missing data chunk")
    dt = np.dtype("<i2") if bits == 16 else np.uint8
    width = (bits // 8) * chans
    usable = (len(data) // width) * width
    raw = np.frombuffer(data[:usable], dtype=dt)
    if tag == 7:
        arr = ulaw_to_linear(raw).astype(np.int32)
    elif tag == 6:
        arr = alaw_to_linear(raw).astype(np.int32)
    else:
        arr = raw.astype(np.int32)
        if bits == 8:
            # 8-bit PCM is UNSIGNED 0..255 per the WAV spec; center at 128
            # so both bit depths yield zero-centered amplitudes and
            # downstream sum_abs/peak/dc reductions are amplitude-
            # meaningful (ADVICE r3)
            arr -= 128
    return arr.reshape(-1, chans)


WAVEFORM_STATS_SCHEMA = (
    "url string, sample_rate int, n_samples long, sum_abs long, "
    "peak int, dc_sum long"
)


def audio_waveform_stats(
    df: DataFrame, url_col: str = "url", bin_col: str = "blob"
) -> DataFrame:
    """mapInPandas REAL-waveform stage: decode_wav_samples per blob, then
    numpy reductions (total |amplitude|, peak, DC sum) — the shape of any
    real loudness/silence/clipping scorer over decoded audio. Narrow, no
    blob shuffle, Arrow-bounded batches."""
    import numpy as np

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for b in pdf[bin_col]:
                blob = bytes(b)
                meta = parse_wav_meta(blob)
                s = decode_wav_samples(blob).reshape(-1).astype(np.int64)
                rows.append(
                    {
                        "sample_rate": meta["sample_rate"],
                        "n_samples": int(s.size),
                        "sum_abs": int(np.abs(s).sum()),
                        "peak": int(np.abs(s).max()) if s.size else 0,
                        "dc_sum": int(s.sum()),
                    }
                )
            out = pd.DataFrame(rows)
            out.insert(0, "url", pdf[url_col].values)
            yield out

    return df.mapInPandas(_stats, WAVEFORM_STATS_SCHEMA)


# MPEG-1 Layer III bitrate table (kbps) and sample rates, ISO 11172-3.
_MP3_BITRATES_V1L3 = (
    None, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, None
)
_MP3_RATES_V1 = (44100, 48000, 32000, None)


def encode_mp3(
    sample_rate: int, bitrate_kbps: int, n_frames: int, mono: bool = True
) -> bytes:
    """REAL minimal MPEG-1 Layer III CBR frame-stream writer (stdlib
    only): emits `n_frames` frames, each a spec-valid 4-byte header
    (11-bit sync, version=MPEG1, layer=III, the requested bitrate and
    sample-rate indices, padding=0, mode=mono/stereo) followed by filler
    up to the exact Layer III frame length 144*bitrate//sample_rate. Any
    MP3 frame parser (this module's, mpg123's header scan) reads back the
    same rate/bitrate/duration; only the audio payload is synthetic."""
    if sample_rate not in _MP3_RATES_V1[:3]:
        raise ValueError(f"unsupported MPEG-1 sample rate: {sample_rate}")
    if bitrate_kbps not in _MP3_BITRATES_V1L3:
        raise ValueError(f"unsupported MPEG-1 Layer III bitrate: {bitrate_kbps}")
    br_idx = _MP3_BITRATES_V1L3.index(bitrate_kbps)
    sr_idx = _MP3_RATES_V1.index(sample_rate)
    frame_len = 144 * bitrate_kbps * 1000 // sample_rate
    # byte0: sync hi; byte1: sync lo(3) + version 11 + layer 01 + no-crc 1
    # byte2: bitrate idx (4) + samplerate idx (2) + padding 0 + private 0
    # byte3: channel mode (2) + rest zero
    hdr = bytes(
        [0xFF, 0xFB, (br_idx << 4) | (sr_idx << 2), (0xC0 if mono else 0x00)]
    )
    frame = hdr + bytes((frame_len - 4) * [0x55])
    return frame * n_frames


def parse_mp3_meta(blob: bytes) -> dict:
    """REAL MP3 structural parser (stdlib only): skips an optional ID3v2
    tag (syncsafe size per id3.org), then WALKS the MPEG-1 Layer III
    frame chain — validating each 4-byte header's sync/version/layer,
    deriving every frame's length from its own bitrate/samplerate fields
    (so VBR streams are counted exactly, the same walk ffprobe does when
    there is no Xing header) — and returns rate/channels and the exact
    duration n_frames*1152*1000//sample_rate. Raises ValueError on
    malformed input: no sync, reserved indices, zero frames."""
    pos = 0
    if blob[:3] == b"ID3" and len(blob) >= 10:
        sz = (
            (blob[6] & 0x7F) << 21 | (blob[7] & 0x7F) << 14
            | (blob[8] & 0x7F) << 7 | (blob[9] & 0x7F)
        )
        pos = 10 + sz
    n_frames = 0
    sample_rate = n_channels = None
    while pos + 4 <= len(blob):
        b0, b1, b2, b3 = blob[pos : pos + 4]
        if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
            break  # end of frame chain (trailing tag/garbage)
        if (b1 & 0x18) != 0x18 or (b1 & 0x06) != 0x02:
            raise ValueError("only MPEG-1 Layer III frames supported")
        br = _MP3_BITRATES_V1L3[b2 >> 4]
        sr = _MP3_RATES_V1[(b2 >> 2) & 3]
        if br is None or sr is None:
            raise ValueError("reserved bitrate/samplerate index")
        if sample_rate is None:
            sample_rate = sr
            n_channels = 1 if (b3 >> 6) == 3 else 2
        padding = (b2 >> 1) & 1
        pos += 144 * br * 1000 // sr + padding
        n_frames += 1
    if not n_frames:
        raise ValueError("no MP3 frames found")
    return {
        "sample_rate": sample_rate,
        "n_channels": n_channels,
        "n_frames": n_frames,
        "duration_ms": n_frames * 1152 * 1000 // sample_rate,
    }


def decode_audio_meta(blob: bytes) -> dict:
    """Audio metadata decode. WAV and MP3 are REAL (parse_wav_meta —
    RIFF chunk walk; parse_mp3_meta — MPEG frame-chain walk); unknown
    formats fall back to a deterministic declared STUB (a real
    deployment replaces the fallback with soundfile/ffprobe).

    Like decode_image_meta: a blob that sniffs WAV/MP3 but fails its
    structural parse becomes a codec="invalid" row with zero fields —
    crawl corpora are full of truncated media, and one bad blob must not
    raise out of a 100 TB stage."""
    n = len(blob)
    sniffed = None
    if blob[:4] == b"RIFF" and blob[8:12] == b"WAVE":
        sniffed = ("wav", parse_wav_meta)
    elif blob[:3] == b"ID3" or (
        len(blob) >= 2 and blob[0] == 0xFF and (blob[1] & 0xE0) == 0xE0
    ):
        sniffed = ("mp3", parse_mp3_meta)
    if sniffed is not None:
        codec, parser = sniffed
        try:
            meta = parser(blob)
        except ValueError:
            return {
                "n_bytes": n,
                "codec": "invalid",
                "sample_rate": 0,
                "n_channels": 0,
                "duration_ms": 0,
            }
        return {
            "n_bytes": n,
            "codec": codec,
            "sample_rate": meta["sample_rate"],
            "n_channels": meta["n_channels"],
            "duration_ms": meta["duration_ms"],
        }
    return {
        "n_bytes": n,
        "codec": "unknown",
        "sample_rate": 8000 + (n % 3) * 4000,
        "n_channels": 1 + (n % 2),
        "duration_ms": n * 10,
    }


def audio_metadata(df: DataFrame, url_col: str = "url", bin_col: str = "blob") -> DataFrame:
    """mapInPandas audio feature-extraction stage (same narrow, Arrow-bounded
    shape as image_metadata; only the pure decode stub differs)."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [decode_audio_meta(bytes(b)) for b in pdf[bin_col]]
            out = pd.DataFrame(metas)
            out.insert(0, "url", pdf[url_col].values)
            yield out

    return df.mapInPandas(_decode, AUDIO_META_SCHEMA)


def encode_mp4(
    timescale: int, duration: int, n_tracks: int, mdat: bytes = b""
) -> bytes:
    """REAL minimal ISO BMFF (MP4) writer (stdlib only): ftyp (major
    brand isom), moov containing a spec-valid version-0 mvhd (timescale,
    duration, rate 1.0, identity matrix, next-track-id) and one tkhd-
    bearing trak box per track, then an mdat with the given payload.
    Box sizes are exact, so any box walker (this module's, mp4box's)
    traverses it; only the media data is synthetic."""
    if timescale <= 0 or duration < 0 or n_tracks < 0:
        raise ValueError("invalid MP4 parameters")

    def box(typ: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", 8 + len(payload)) + typ + payload

    mvhd = (
        b"\x00\x00\x00\x00"                      # version 0 + flags
        + struct.pack(">II", 0, 0)               # creation, modification
        + struct.pack(">II", timescale, duration)
        + struct.pack(">I", 0x00010000)          # rate 1.0
        + struct.pack(">H", 0x0100)              # volume 1.0
        + b"\x00" * 10                           # reserved
        + struct.pack(                            # unity matrix
            ">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000
        )
        + b"\x00" * 24                           # pre_defined
        + struct.pack(">I", n_tracks + 1)        # next_track_ID
    )
    traks = b""
    for tid in range(1, n_tracks + 1):
        tkhd = (
            b"\x00\x00\x00\x07"                  # v0, enabled|in-movie|preview
            + struct.pack(">II", 0, 0)
            + struct.pack(">I", tid)
            + b"\x00" * 4
            + struct.pack(">I", duration)
            + b"\x00" * 8
            + struct.pack(">HHHH", 0, 0, 0, 0)   # layer/group/volume/reserved
            + struct.pack(
                ">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000
            )
            + struct.pack(">II", 0, 0)           # width, height (16.16)
        )
        traks += box(b"trak", box(b"tkhd", tkhd))
    ftyp = b"isom" + struct.pack(">I", 0x200) + b"isom" + b"mp42"
    return box(b"ftyp", ftyp) + box(b"moov", box(b"mvhd", mvhd) + traks) + box(
        b"mdat", mdat
    )


def _walk_mp4_boxes(blob: bytes, lo: int, hi: int):
    """Yield (type, body_start, box_end) for each ISO 14496-12 box in
    blob[lo:hi] — u32 size + 4cc, size==1 largesize and size==0 to-EOF
    handled per §4.2. Shared by the metadata and sample-table parsers."""
    pos = lo
    while pos + 8 <= hi:
        (size,) = struct.unpack(">I", blob[pos : pos + 4])
        typ = blob[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:
            if pos + 16 > hi:
                raise ValueError("MP4 largesize box truncated")
            (size,) = struct.unpack(">Q", blob[pos + 8 : pos + 16])
            body = pos + 16
        elif size == 0:
            size = hi - pos
        if size < 8 or pos + size > hi:
            raise ValueError("MP4 box overruns blob")
        yield typ, body, pos + size
        pos += size


def parse_mp4_meta(blob: bytes) -> dict:
    """REAL ISO BMFF structural parser (stdlib only): walks top-level
    boxes (u32 size + 4cc, size==1 largesize and size==0 to-EOF handled
    per ISO 14496-12 §4.2), finds moov, walks its children for mvhd
    (version 0 or 1 field layouts) and counts trak boxes; returns
    timescale/duration and duration_ms = duration*1000//timescale —
    the same traversal ffprobe/mp4box perform for container metadata.
    Raises ValueError on malformed input: no ftyp/moov, truncated box,
    missing mvhd."""
    walk = lambda lo, hi: _walk_mp4_boxes(blob, lo, hi)  # noqa: E731

    if len(blob) < 12 or blob[4:8] != b"ftyp":
        raise ValueError("not an MP4: first box is not ftyp")
    major_brand = blob[8:12].decode("latin-1")
    moov = None
    for typ, body, end in walk(0, len(blob)):
        if typ == b"moov":
            moov = (body, end)
            break
    if moov is None:
        raise ValueError("MP4 missing moov box")
    timescale = duration = None
    n_tracks = 0
    for typ, body, end in walk(*moov):
        if typ == b"mvhd":
            version = blob[body]
            if version == 1:
                timescale, duration = (
                    struct.unpack(">I", blob[body + 20 : body + 24])[0],
                    struct.unpack(">Q", blob[body + 24 : body + 32])[0],
                )
            else:
                timescale, duration = struct.unpack(
                    ">II", blob[body + 12 : body + 20]
                )
        elif typ == b"trak":
            n_tracks += 1
    if timescale is None or timescale == 0:
        raise ValueError("MP4 missing or invalid mvhd")
    return {
        "major_brand": major_brand,
        "timescale": timescale,
        "duration": duration,
        "duration_ms": duration * 1000 // timescale,
        "n_tracks": n_tracks,
    }


def encode_mp4_samples(
    timescale: int, durations: list[int], samples: list[bytes]
) -> bytes:
    """REAL fragmentless MP4 writer WITH a sample table (stdlib only):
    ftyp, then mdat holding the concatenated samples, then moov with a
    single video trak whose stbl carries the four real sample-table boxes
    — stts (run-length decode deltas), stsc (samples-per-chunk runs,
    chunks of ≤3 samples so multi-run stsc is exercised), stsz
    (per-sample sizes) and stco (absolute chunk offsets). mdat precedes
    moov (valid per ISO 14496-12, and what streaming-unfriendly muxers
    emit) so chunk offsets are exact without a patch pass. Any conformant
    demuxer can locate every sample; parse_mp4_samples round-trips it."""
    if timescale <= 0 or len(durations) != len(samples) or not samples:
        raise ValueError("invalid MP4 sample parameters")

    def box(typ: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", 8 + len(payload)) + typ + payload

    def full(typ: bytes, payload: bytes, version: int = 0, flags: int = 0) -> bytes:
        return box(typ, struct.pack(">B", version) + flags.to_bytes(3, "big") + payload)

    n = len(samples)
    mdat_payload = b"".join(samples)
    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isom" + b"mp42")
    mdat = box(b"mdat", mdat_payload)
    data_base = len(ftyp) + 8  # mdat body offset in the file

    # chunking: groups of 3 samples (last chunk may be short)
    spc = 3
    chunk_sizes = [min(spc, n - i) for i in range(0, n, spc)]
    chunk_offsets, acc, si = [], data_base, 0
    for csz in chunk_sizes:
        chunk_offsets.append(acc)
        acc += sum(len(samples[si + j]) for j in range(csz))
        si += csz
    # stsc runs: (first_chunk, samples_per_chunk, sample_desc_index)
    stsc_runs = [(1, spc, 1)]
    if chunk_sizes[-1] != spc and len(chunk_sizes) > 1:
        stsc_runs.append((len(chunk_sizes), chunk_sizes[-1], 1))
    elif chunk_sizes[-1] != spc:  # single short chunk
        stsc_runs = [(1, chunk_sizes[-1], 1)]
    # stts runs: run-length encode consecutive equal durations
    stts_runs: list[tuple[int, int]] = []
    for d in durations:
        if stts_runs and stts_runs[-1][1] == d:
            stts_runs[-1] = (stts_runs[-1][0] + 1, d)
        else:
            stts_runs.append((1, d))

    stts = full(b"stts", struct.pack(">I", len(stts_runs))
                + b"".join(struct.pack(">II", c, d) for c, d in stts_runs))
    stsc = full(b"stsc", struct.pack(">I", len(stsc_runs))
                + b"".join(struct.pack(">III", f, s, i) for f, s, i in stsc_runs))
    stsz = full(b"stsz", struct.pack(">II", 0, n)
                + b"".join(struct.pack(">I", len(s)) for s in samples))
    stco = full(b"stco", struct.pack(">I", len(chunk_offsets))
                + b"".join(struct.pack(">I", o) for o in chunk_offsets))
    # minimal mp4v visual sample entry (86 bytes) so stsd is spec-shaped
    entry = (
        struct.pack(">I", 86) + b"mp4v" + b"\x00" * 6 + struct.pack(">H", 1)
        + b"\x00" * 16 + struct.pack(">HH", 64, 48)
        + struct.pack(">II", 0x480000, 0x480000) + b"\x00" * 4
        + struct.pack(">H", 1) + b"\x00" * 32 + struct.pack(">Hh", 24, -1)
    )
    stsd = full(b"stsd", struct.pack(">I", 1) + entry)
    stbl = box(b"stbl", stsd + stts + stsc + stsz + stco)
    dref = full(b"dref", struct.pack(">I", 1) + full(b"url ", b"", flags=1))
    minf = box(b"minf", full(b"vmhd", struct.pack(">HHHH", 0, 0, 0, 0), flags=1)
               + box(b"dinf", dref) + stbl)
    total_dur = sum(durations)
    mdhd = full(b"mdhd", struct.pack(">IIII", 0, 0, timescale, total_dur)
                + struct.pack(">HH", 0x55C4, 0))  # lang 'und'
    hdlr = full(b"hdlr", struct.pack(">I", 0) + b"vide" + b"\x00" * 12 + b"\x00")
    mdia = box(b"mdia", mdhd + hdlr + minf)
    tkhd = full(
        b"tkhd",
        struct.pack(">III", 0, 0, 1) + b"\x00" * 4 + struct.pack(">I", total_dur)
        + b"\x00" * 8 + struct.pack(">HHHH", 0, 0, 0, 0)
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", 64 << 16, 48 << 16),
        flags=7,
    )
    trak = box(b"trak", tkhd + mdia)
    mvhd = full(
        b"mvhd",
        struct.pack(">IIII", 0, 0, timescale, total_dur)
        + struct.pack(">I", 0x00010000) + struct.pack(">H", 0x0100)
        + b"\x00" * 10
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24 + struct.pack(">I", 2),
    )
    return ftyp + mdat + box(b"moov", mvhd + trak)


def parse_mp4_samples(blob: bytes) -> list[dict]:
    """REAL ISO BMFF sample-table demux (stdlib only): for every trak in
    moov, reads mdhd (media timescale, v0/v1), then the stbl tables —
    stts expanded to per-sample decode times, stsz (uniform or
    per-sample) to sizes, stsc runs + stco/co64 to per-sample absolute
    file offsets — exactly the traversal a demuxer performs to locate
    frame payloads. Returns one dict per track with a sample table:
    {"timescale": int, "samples": [(offset, size, dts), ...]}. Tracks
    without a complete stbl are skipped; malformed boxes raise
    ValueError."""
    if len(blob) < 12 or blob[4:8] != b"ftyp":
        raise ValueError("not an MP4: first box is not ftyp")
    moov = None
    for typ, body, end in _walk_mp4_boxes(blob, 0, len(blob)):
        if typ == b"moov":
            moov = (body, end)
            break
    if moov is None:
        raise ValueError("MP4 missing moov box")

    def find(lo, hi, want):
        for typ, body, end in _walk_mp4_boxes(blob, lo, hi):
            if typ == want:
                return body, end
        return None

    tracks = []
    for typ, t_body, t_end in _walk_mp4_boxes(blob, *moov):
        if typ != b"trak":
            continue
        mdia = find(t_body, t_end, b"mdia")
        if mdia is None:
            continue
        mdhd = find(*mdia, b"mdhd")
        minf = find(*mdia, b"minf")
        if mdhd is None or minf is None:
            continue
        version = blob[mdhd[0]]
        ts_off = mdhd[0] + (20 if version == 1 else 12)
        (media_ts,) = struct.unpack(">I", blob[ts_off : ts_off + 4])
        stbl = find(*minf, b"stbl")
        if stbl is None:
            continue
        tables: dict[bytes, tuple[int, int]] = {}
        for bt, bb, be in _walk_mp4_boxes(blob, *stbl):
            tables[bt] = (bb, be)
        if not all(k in tables for k in (b"stts", b"stsz")) or not (
            b"stco" in tables or b"co64" in tables
        ) or b"stsc" not in tables:
            continue

        def u32s(count, at):
            return struct.unpack(f">{count}I", blob[at : at + 4 * count])

        def bounded(count, entry_bytes, table, fixed=4):
            # a stream-supplied count must fit inside its enclosing box:
            # a corrupted count (e.g. 0x7FFFFFFF) would otherwise drive a
            # multi-billion-entry Python list build / parser hang
            # (ADVICE r3). fixed = bytes of count field(s) between the
            # version/flags word and the entries.
            lo, hi = tables[table]
            if count < 0 or count * entry_bytes > (hi - lo) - 4 - fixed:
                raise ValueError(
                    f"{table.decode()} declares {count} entries but box "
                    f"holds {hi - lo} bytes"
                )
            return count

        # no table can describe more samples than the file has bytes —
        # every sample occupies file bytes; caps the uniform-stsz and
        # stts run-expansion paths, which have no per-entry table bytes
        max_samples = len(blob)

        # stts -> per-sample dts
        b0 = tables[b"stts"][0] + 4
        (n_runs,) = struct.unpack(">I", blob[b0 : b0 + 4])
        bounded(n_runs, 8, b"stts")
        dts, t = [], 0
        pos = b0 + 4
        for _ in range(n_runs):
            cnt, delta = struct.unpack(">II", blob[pos : pos + 8])
            if cnt > max_samples - len(dts):
                raise ValueError(
                    f"stts run declares {cnt} samples in a {len(blob)}-byte file"
                )
            for _ in range(cnt):
                dts.append(t)
                t += delta
            pos += 8
        # stsz -> sizes
        b0 = tables[b"stsz"][0] + 4
        uniform, n_samples = struct.unpack(">II", blob[b0 : b0 + 8])
        if uniform:
            if n_samples > max_samples:
                raise ValueError(
                    f"stsz declares {n_samples} samples in a {len(blob)}-byte file"
                )
            sizes = [uniform] * n_samples
        else:
            bounded(n_samples, 4, b"stsz", fixed=8)
            sizes = list(u32s(n_samples, b0 + 8))
        # stco / co64 -> chunk offsets
        if b"stco" in tables:
            b0 = tables[b"stco"][0] + 4
            (n_chunks,) = struct.unpack(">I", blob[b0 : b0 + 4])
            bounded(n_chunks, 4, b"stco")
            chunk_offs = list(u32s(n_chunks, b0 + 4))
        else:
            b0 = tables[b"co64"][0] + 4
            (n_chunks,) = struct.unpack(">I", blob[b0 : b0 + 4])
            bounded(n_chunks, 8, b"co64")
            chunk_offs = list(
                struct.unpack(f">{n_chunks}Q", blob[b0 + 4 : b0 + 4 + 8 * n_chunks])
            )
        # stsc runs -> samples-per-chunk per chunk index
        b0 = tables[b"stsc"][0] + 4
        (n_sc,) = struct.unpack(">I", blob[b0 : b0 + 4])
        bounded(n_sc, 12, b"stsc")
        runs = [
            struct.unpack(">III", blob[b0 + 4 + 12 * i : b0 + 16 + 12 * i])
            for i in range(n_sc)
        ]
        per_chunk = []
        for i, (first, spc, _sdi) in enumerate(runs):
            last = runs[i + 1][0] - 1 if i + 1 < len(runs) else n_chunks
            per_chunk.extend([spc] * (last - first + 1))
        # per-sample absolute offsets
        samples, si = [], 0
        for ci, coff in enumerate(chunk_offs):
            off = coff
            for _ in range(per_chunk[ci] if ci < len(per_chunk) else 0):
                if si >= n_samples:
                    break
                samples.append((off, sizes[si], dts[si] if si < len(dts) else 0))
                off += sizes[si]
                si += 1
        if samples:
            tracks.append({"timescale": media_ts, "samples": samples})
    return tracks


VIDEO_META_SCHEMA = (
    "url string, n_bytes long, container string, timescale int, "
    "duration_ms long, n_tracks int"
)


def video_metadata(df: DataFrame, url_col: str = "url", bin_col: str = "blob") -> DataFrame:
    """mapInPandas container-metadata stage for video (same narrow,
    Arrow-bounded shape as image/audio_metadata). MP4/ISO-BMFF is REAL
    (parse_mp4_meta); other containers report 'unknown' with
    deterministic stub fields (frame/pixel decode stays a declared stub
    — see sample_video_frames)."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for b in pdf[bin_col]:
                blob = bytes(b)
                n = len(blob)
                if len(blob) >= 12 and blob[4:8] == b"ftyp":
                    try:
                        m = parse_mp4_meta(blob)
                    except (ValueError, struct.error, IndexError):
                        # truncated/mislabeled container: quarantine row,
                        # never an exception out of a crawl-scale stage
                        rows.append(
                            {
                                "n_bytes": n,
                                "container": "invalid",
                                "timescale": 0,
                                "duration_ms": 0,
                                "n_tracks": 0,
                            }
                        )
                        continue
                    rows.append(
                        {
                            "n_bytes": n,
                            "container": "mp4",
                            "timescale": m["timescale"],
                            "duration_ms": m["duration_ms"],
                            "n_tracks": m["n_tracks"],
                        }
                    )
                else:
                    rows.append(
                        {
                            "n_bytes": n,
                            "container": "unknown",
                            "timescale": 0,
                            "duration_ms": n * 40,
                            "n_tracks": 1,
                        }
                    )
            out = pd.DataFrame(rows)
            out.insert(0, "url", pdf[url_col].values)
            yield out

    return df.mapInPandas(_decode, VIDEO_META_SCHEMA)


VIDEO_FRAME_SCHEMA = "url string, frame_idx int, frame_ms long, frame_hash long"


def _uniform_indices(n: int, k: int) -> list[int]:
    """k indices uniformly spread over 0..n-1 (all of them when n <= k) —
    the standard deterministic frame-sampling policy."""
    if n <= k:
        return list(range(n))
    return [j * (n - 1) // (k - 1) for j in range(k)]


def sample_video_frames(
    df: DataFrame,
    url_col: str = "url",
    bin_col: str = "blob",
    max_frames: int = 5,
) -> DataFrame:
    """mapInPandas frame-sampling stage: one OUTPUT ROW PER SAMPLED FRAME
    (a 1→N expansion inside the Python worker — the shape a real
    ffmpeg-based sampler has).

    For MP4 blobs carrying a sample table this is REAL demuxing
    (parse_mp4_samples): the stts/stsz/stsc/stco walk locates each frame
    payload, up to ``max_frames`` frames are picked uniformly across the
    first video track, frame_ms comes from the real decode timestamps at
    the track's media timescale, and frame_hash is the CRC-32 of the
    actual frame bytes sliced out of mdat. Blobs without a sample table
    (non-MP4, metadata-only MP4s) keep the deterministic declared stub
    (count/ms/hash derived from length — a real deploy swaps in ffmpeg
    for the codec decode those need). Either way the binary never leaves
    its partition."""

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls: list[str] = []
            idxs: list[int] = []
            mss: list[int] = []
            hashes: list[int] = []
            for url, b in zip(pdf[url_col], pdf[bin_col]):
                blob = bytes(b)
                tracks = []
                if len(blob) >= 12 and blob[4:8] == b"ftyp":
                    try:
                        tracks = parse_mp4_samples(blob)
                    except (ValueError, struct.error, IndexError):
                        tracks = []
                if tracks:
                    ts = tracks[0]["timescale"] or 1
                    samples = tracks[0]["samples"]
                    for i in _uniform_indices(len(samples), max_frames):
                        off, size, dts = samples[i]
                        urls.append(url)
                        idxs.append(i)
                        mss.append(dts * 1000 // ts)
                        hashes.append(zlib.crc32(blob[off : off + size]))
                    continue
                n = len(blob)
                n_frames = 1 + n % 5
                for i in range(n_frames):
                    urls.append(url)
                    idxs.append(i)
                    mss.append(i * 1000)
                    # stub frame hash: position-salted content length
                    hashes.append((n * 1000003 + i * 8191) % (1 << 62))
            yield pd.DataFrame(
                {
                    "url": urls,
                    "frame_idx": pd.array(idxs, dtype="int32"),
                    "frame_ms": pd.array(mss, dtype="int64"),
                    "frame_hash": pd.array(hashes, dtype="int64"),
                }
            )

    return df.mapInPandas(_sample, VIDEO_FRAME_SCHEMA)


FRAME_STATS_SCHEMA = (
    "url string, frame_idx int, frame_ms long, frame_size int, "
    "frame_sum long, first_byte int, last_byte int"
)


def video_frame_stats(
    df: DataFrame,
    url_col: str = "url",
    bin_col: str = "blob",
    max_frames: int = 8,
) -> DataFrame:
    """REAL-demux frame statistics: parse_mp4_samples locates every frame
    payload via the sample table, up to ``max_frames`` frames per blob are
    sliced out of mdat (uniform policy), and per-frame byte reductions
    (size/sum/first/last) plus the real decode timestamp are emitted —
    SQL-expressible outputs so an independent oracle can verify that the
    demux found the true payload bytes at the true offsets. Blobs without
    a sample table produce no rows (strict: this stage is only for real
    demuxable video). mapInPandas, narrow, blobs never shuffle."""

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, b in zip(pdf[url_col], pdf[bin_col]):
                blob = bytes(b)
                if len(blob) < 12 or blob[4:8] != b"ftyp":
                    continue
                try:
                    tracks = parse_mp4_samples(blob)
                except (ValueError, struct.error, IndexError):
                    continue
                if not tracks:
                    continue
                ts = tracks[0]["timescale"] or 1
                samples = tracks[0]["samples"]
                for i in _uniform_indices(len(samples), max_frames):
                    off, size, dts = samples[i]
                    payload = blob[off : off + size]
                    rows.append(
                        {
                            "url": url,
                            "frame_idx": i,
                            "frame_ms": dts * 1000 // ts,
                            "frame_size": size,
                            "frame_sum": int(sum(payload)),
                            "first_byte": payload[0] if size else 0,
                            "last_byte": payload[-1] if size else 0,
                        }
                    )
            out = pd.DataFrame(
                rows,
                columns=[
                    "url", "frame_idx", "frame_ms", "frame_size",
                    "frame_sum", "first_byte", "last_byte",
                ],
            )
            for c, t in (
                ("frame_idx", "int32"), ("frame_ms", "int64"),
                ("frame_size", "int32"), ("frame_sum", "int64"),
                ("first_byte", "int32"), ("last_byte", "int32"),
            ):
                out[c] = out[c].astype(t)
            yield out

    return df.mapInPandas(_stats, FRAME_STATS_SCHEMA)


FEATURE_SCHEMA = "url string, n_bytes long, feature array<float>"
N_BYTE_BINS = 16


def byte_histogram_features(
    df: DataFrame, url_col: str = "url", bin_col: str = "blob"
) -> DataFrame:
    """REAL (non-stub) feature extraction over opaque binary columns: the
    L2-normalized 16-bin byte histogram (high-nibble distribution) of each
    blob — computable without codec libraries, discriminative enough for
    format clustering / exact-dup detection, and shaped exactly like a
    learned embedding (array<float>), so it composes directly with the
    ANN operators (operators/similarity.py) for content-based retrieval
    over media columns. numpy bincount per blob inside mapInPandas; the
    binary never leaves its partition."""
    import numpy as np

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, sizes, feats = [], [], []
            for url, b in zip(pdf[url_col], pdf[bin_col]):
                blob = bytes(b) if b is not None else b""
                urls.append(url)
                sizes.append(len(blob))
                if blob:
                    arr = np.frombuffer(blob, dtype=np.uint8)
                    hist = np.bincount(arr >> 4, minlength=N_BYTE_BINS).astype(
                        np.float64
                    )
                    nrm = np.linalg.norm(hist)
                    feats.append((hist / nrm).astype(np.float32).tolist())
                else:
                    feats.append([0.0] * N_BYTE_BINS)
            yield pd.DataFrame(
                {
                    "url": urls,
                    "n_bytes": pd.array(sizes, dtype="int64"),
                    "feature": pd.Series(feats, dtype=object),
                }
            )

    return df.mapInPandas(_feat, FEATURE_SCHEMA)


def resize_image(blob: bytes, width: int, height: int) -> bytes:
    """Thumbnail resize. PNG (all decoded shapes, 8- and 16-bit), JPEG
    (grayscale and color — color thumbnails re-encode through the RGB
    arm of encode_jpeg_pixels) and GIF are REAL (decode →
    nearest-neighbor resample → re-encode with the real encoders);
    other formats need a pixel decoder absent from this container (same
    swap point as decode_image_pixels)."""
    if blob[:8] == _PNG_SIG:
        return resize_png(blob, width, height)
    if blob[:4] == b"GIF8":
        import numpy as np

        from .gifcodec import decode_gif_pixels, encode_gif

        if width <= 0 or height <= 0:
            raise ValueError("resize dimensions must be positive")
        px = decode_gif_pixels(blob)
        src_h, src_w = px.shape[:2]
        rows = (np.arange(height) * src_h) // height
        cols = (np.arange(width) * src_w) // width
        return encode_gif(width, height, px[rows][:, cols, 0].tobytes())
    if blob[:2] == b"\xff\xd8":
        import numpy as np

        from .jpegcodec import decode_jpeg_pixels, encode_jpeg_pixels

        if width <= 0 or height <= 0:
            raise ValueError("resize dimensions must be positive")
        px = decode_jpeg_pixels(blob)
        src_h, src_w = px.shape[:2]
        rows = (np.arange(height) * src_h) // height
        cols = (np.arange(width) * src_w) // width
        # keep the channel axis: (H, W, 1) re-encodes grayscale,
        # (H, W, 3) re-encodes color — slicing channel 0 here would
        # silently thumbnail the RED plane of a color photo
        return encode_jpeg_pixels(px[rows][:, cols])
    raise NotImplementedError(
        "resize for this format requires PIL/libvips; "
        "not available in this environment"
    )


def sniff_mime(blob) -> "Column":
    """Magic-byte content-type sniffing over an opaque binary column —
    the routing step a crawler runs on every fetched body BEFORE parsing
    (Content-Type headers lie; WHATWG MIME-sniffing exists because of
    it). Detects the formats the engine has downstream paths for: PNG
    (image pipeline), WAV/RIFF (audio), PDF, gzip, XML/feeds, HTML;
    everything else falls to application/octet-stream.

    Pure JVM expressions: binary signatures compare hex prefixes, the
    text-ish checks decode a bounded 256-byte head as ISO-8859-1 (total —
    every byte maps, so no decode error on binary junk reaching the
    HTML arm). No UDF, no shuffle — stays inside whole-stage codegen, so
    sniffing 100 TB of bodies costs one map pass over bytes already in
    memory for the parse that follows.
    """
    from pyspark.sql import functions as F

    def hexp(n: int):
        return F.hex(F.substring(blob, 1, n))

    # regexp strip, not ltrim: Spark's ltrim removes only ' ' — leading
    # \n\t before <!DOCTYPE is routine in real HTML
    head = F.lower(
        F.regexp_replace(
            F.decode(F.substring(blob, 1, 256), "ISO-8859-1"), r"^\s+", ""
        )
    )
    return (
        F.when(hexp(8) == "89504E470D0A1A0A", F.lit("image/png"))
        .when(hexp(2) == "FFD8", F.lit("image/jpeg"))  # SOI
        .when(hexp(4) == "47494638", F.lit("image/gif"))  # GIF8
        .when(hexp(5) == "255044462D", F.lit("application/pdf"))  # %PDF-
        .when(
            (hexp(4) == "52494646")  # RIFF
            & (F.hex(F.substring(blob, 9, 4)) == "57415645"),  # WAVE
            F.lit("audio/wav"),
        )
        .when(hexp(2) == "1F8B", F.lit("application/gzip"))
        .when(head.startswith("<?xml"), F.lit("application/xml"))
        .when(
            head.startswith("<!doctype html") | head.startswith("<html"),
            F.lit("text/html"),
        )
        .otherwise(F.lit("application/octet-stream"))
    )
