"""Deterministic binary-column fixtures shared by the Spark queries and
the DuckDB oracle.

The driver's correctness gate compares a Spark query against an ANSI-SQL
oracle over the same tables. The testdata tables carry no binary column,
so the multimodal PNG query materializes one here: a parquet of
(doc_id, png) where the PNG bytes are a pure deterministic function of
doc_id (dimensions and pixel payload below, encoded by the REAL
encode_png — zlib deflate + CRC-32). Both engines then read the SAME
bytes: Spark parses them with parse_png_meta (functions/multimodal.py)
and the oracle parses them independently in SQL (octet_length + hex()
big-endian field extraction) — no shared decode code, which is what
makes the driver row non-circular.

Generation is import-time, idempotent (exists-check) and atomic
(tmp + os.replace), so the fixture exists before either engine runs
regardless of which side the driver executes first. ~5k tiny PNGs,
<1 s, a few MB. Derived only from doc_id ranges of the local testdata
tables — no external data.
"""

from __future__ import annotations

import os
import tempfile

import numpy as np

#: bump when the generative formula changes — the path IS the version
PNG_FIXTURE_PATH = os.path.join(
    tempfile.gettempdir(), "ofs-png-fixture-v1.parquet"
)
WAV_FIXTURE_PATH = os.path.join(
    tempfile.gettempdir(), "ofs-wav-fixture-v1.parquet"
)
JPEG_FIXTURE_PATH = os.path.join(
    tempfile.gettempdir(), "ofs-jpeg-fixture-v1.parquet"
)
MP3_FIXTURE_PATH = os.path.join(
    tempfile.gettempdir(), "ofs-mp3-fixture-v1.parquet"
)
MP4_FIXTURE_PATH = os.path.join(
    tempfile.gettempdir(), "ofs-mp4-fixture-v1.parquet"
)
MP4_FRAMES_FIXTURE_PATH = os.path.join(
    tempfile.gettempdir(), "ofs-mp4-frames-fixture-v1.parquet"
)
JPEG_PX_FIXTURE_PATH = os.path.join(
    tempfile.gettempdir(), "ofs-jpeg-px-fixture-v1.parquet"
)
GIF_FIXTURE_PATH = os.path.join(
    tempfile.gettempdir(), "ofs-gif-fixture-v1.parquet"
)
PNG_PALETTE_FIXTURE_PATH = os.path.join(
    tempfile.gettempdir(), "ofs-png-palette-fixture-v1.parquet"
)
G711_FIXTURE_PATH = os.path.join(
    tempfile.gettempdir(), "ofs-g711-fixture-v1.parquet"
)
PNG16_FIXTURE_PATH = os.path.join(
    tempfile.gettempdir(), "ofs-png16-fixture-v1.parquet"
)
JPEG_COLOR_FIXTURE_PATH = os.path.join(
    tempfile.gettempdir(), "ofs-jpeg-color-fixture-v3.parquet"
)
JPEG_EXIF_FIXTURE_PATH = os.path.join(
    tempfile.gettempdir(), "ofs-jpeg-exif-fixture-v1.parquet"
)

_WAV_RATES = (8000, 16000, 22050, 44100)


def wav_params(doc_id: int) -> tuple[int, int, int]:
    """Fixture audio parameters (sample_rate, n_channels, n_frames): a
    pure function of doc_id sweeping the common rates, mono/stereo, and
    frame counts that exercise the duration integer arithmetic."""
    return (
        _WAV_RATES[doc_id % len(_WAV_RATES)],
        1 + doc_id % 2,
        50 + (doc_id * 13) % 400,
    )

_TESTDATA_ROOT = "/root/testdata"
_FALLBACK_MAX_DOC_ID = 4999


def png_dims(doc_id: int) -> tuple[int, int]:
    """Fixture dimensions: a pure function of doc_id, chosen to sweep a
    range of non-square shapes (1..64 x 1..48)."""
    return 1 + doc_id % 64, 1 + (doc_id * 7) % 48


def png_payload(doc_id: int, n: int) -> bytes:
    """Fixture pixel bytes: Knuth-hash mixed index stream — deterministic,
    content varies per doc so compressed sizes differ."""
    idx = np.arange(n, dtype=np.uint64)
    return (
        ((np.uint64(doc_id) * np.uint64(2654435761) + idx * np.uint64(40503)))
        .astype(np.uint8)
        .tobytes()
    )


def _max_doc_id() -> int:
    """Largest doc_id across the local testdata scale factors (parquet
    footer metadata only — no full scan); falls back to the known range
    when testdata is absent (e.g. unit tests on a bare checkout)."""
    import glob

    import pyarrow.parquet as pq

    best = -1
    for path in glob.glob(os.path.join(_TESTDATA_ROOT, "sf*", "documents.parquet")):
        try:
            md = pq.ParquetFile(path).metadata
            for rg in range(md.num_row_groups):
                col = md.row_group(rg).column(0)
                if col.path_in_schema == "doc_id" and col.statistics is not None:
                    best = max(best, int(col.statistics.max))
        except Exception:
            continue
    return best if best >= 0 else _FALLBACK_MAX_DOC_ID


def ensure_wav_fixture() -> str:
    """Create WAV_FIXTURE_PATH if missing; return the path. One canonical
    44-byte-header PCM WAV per doc_id (real encode_wav — RIFF sizes,
    little-endian fmt fields), payload derived from doc_id via the same
    Knuth-hash stream the PNG fixture uses. Atomic like the PNG path."""
    if os.path.exists(WAV_FIXTURE_PATH):
        return WAV_FIXTURE_PATH

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ..functions.multimodal import encode_wav

    n_docs = _max_doc_id() + 1
    ids, blobs = [], []
    for doc_id in range(n_docs):
        rate, chans, frames = wav_params(doc_id)
        payload = png_payload(doc_id, frames * chans * 2)
        ids.append(doc_id)
        blobs.append(encode_wav(rate, chans, payload))
    table = pa.table(
        {"doc_id": pa.array(ids, type=pa.int64()),
         "wav": pa.array(blobs, type=pa.binary())}
    )
    fd, tmp = tempfile.mkstemp(
        dir=os.path.dirname(WAV_FIXTURE_PATH), suffix=".parquet.tmp"
    )
    os.close(fd)
    try:
        pq.write_table(table, tmp)
        os.replace(tmp, WAV_FIXTURE_PATH)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    return WAV_FIXTURE_PATH


def g711_params(doc_id: int) -> tuple[int, int, int, int]:
    """Fixture G.711 parameters (fmt_tag, sample_rate, n_channels,
    n_frames): even doc_ids carry µ-law (tag 7), odd a-law (tag 6) —
    both telephony codings, rates swept like the PCM fixture."""
    return (
        7 if doc_id % 2 == 0 else 6,
        _WAV_RATES[doc_id % len(_WAV_RATES)],
        1 + (doc_id // 2) % 2,
        40 + (doc_id * 11) % 300,
    )


def ensure_g711_fixture() -> str:
    """Create G711_FIXTURE_PATH if missing; return the path. One G.711
    WAV per doc_id (real encode_wav with fmt tag 6/7), payload bytes from
    the shared Knuth-hash stream — every byte value is a valid G.711
    code, so the whole byte space is exercised and the DuckDB oracle can
    re-derive every decoded sample from the generative formula through
    the exact segment-expansion arithmetic. Atomic like the PNG path."""
    if os.path.exists(G711_FIXTURE_PATH):
        return G711_FIXTURE_PATH

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ..functions.multimodal import encode_wav

    n_docs = _max_doc_id() + 1
    ids, blobs = [], []
    for doc_id in range(n_docs):
        tag, rate, chans, frames = g711_params(doc_id)
        payload = png_payload(doc_id, frames * chans)
        ids.append(doc_id)
        blobs.append(encode_wav(rate, chans, payload, fmt_tag=tag))
    table = pa.table(
        {"doc_id": pa.array(ids, type=pa.int64()),
         "wav": pa.array(blobs, type=pa.binary())}
    )
    fd, tmp = tempfile.mkstemp(
        dir=os.path.dirname(G711_FIXTURE_PATH), suffix=".parquet.tmp"
    )
    os.close(fd)
    try:
        pq.write_table(table, tmp)
        os.replace(tmp, G711_FIXTURE_PATH)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    return G711_FIXTURE_PATH


def jpeg_dims(doc_id: int) -> tuple[int, int]:
    """Fixture dimensions for the JPEG leg: sweeps 1..320 x 1..240 with a
    different stride than the PNG fixture so the two blobs never agree by
    coincidence."""
    return 1 + doc_id % 320, 1 + (doc_id * 11) % 240


def ensure_jpeg_fixture() -> str:
    """Create JPEG_FIXTURE_PATH if missing; return the path. One
    structurally-valid baseline JFIF per doc_id (real encode_jpeg —
    T.81 marker syntax, SOF0 dimensions, byte-stuffed entropy payload),
    payload from the shared Knuth-hash stream. The encoder's canonical
    segment order (SOI, APP0=16, DQT=67, SOF0) pins the frame header at a
    fixed offset, which is what lets the DuckDB oracle re-extract
    height/width independently in SQL. Atomic like the PNG path."""
    if os.path.exists(JPEG_FIXTURE_PATH):
        return JPEG_FIXTURE_PATH

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ..functions.multimodal import encode_jpeg

    n_docs = _max_doc_id() + 1
    ids, blobs = [], []
    for doc_id in range(n_docs):
        w, h = jpeg_dims(doc_id)
        ids.append(doc_id)
        blobs.append(encode_jpeg(w, h, png_payload(doc_id, 32 + doc_id % 97)))
    table = pa.table(
        {"doc_id": pa.array(ids, type=pa.int64()),
         "jpeg": pa.array(blobs, type=pa.binary())}
    )
    fd, tmp = tempfile.mkstemp(
        dir=os.path.dirname(JPEG_FIXTURE_PATH), suffix=".parquet.tmp"
    )
    os.close(fd)
    try:
        pq.write_table(table, tmp)
        os.replace(tmp, JPEG_FIXTURE_PATH)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    return JPEG_FIXTURE_PATH


_MP3_RATES = (44100, 48000, 32000)
_MP3_BITRATES = (64, 128, 192, 320)


def mp3_params(doc_id: int) -> tuple[int, int, int, bool]:
    """Fixture MP3 parameters (sample_rate, bitrate_kbps, n_frames,
    mono): a pure function of doc_id sweeping the MPEG-1 rates, common
    CBR bitrates, frame counts, and both channel modes."""
    return (
        _MP3_RATES[doc_id % len(_MP3_RATES)],
        _MP3_BITRATES[doc_id % len(_MP3_BITRATES)],
        3 + (doc_id * 5) % 40,
        doc_id % 2 == 0,
    )


def ensure_mp3_fixture() -> str:
    """Create MP3_FIXTURE_PATH if missing; return the path. One spec-valid
    MPEG-1 Layer III CBR frame stream per doc_id (real encode_mp3; no
    ID3 tag, so the first frame header sits at byte 0 — what lets the
    DuckDB oracle decode rate/bitrate indices and count frames by pure
    integer arithmetic). Atomic like the PNG path."""
    if os.path.exists(MP3_FIXTURE_PATH):
        return MP3_FIXTURE_PATH

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ..functions.multimodal import encode_mp3

    n_docs = _max_doc_id() + 1
    ids, blobs = [], []
    for doc_id in range(n_docs):
        rate, kbps, frames, mono = mp3_params(doc_id)
        ids.append(doc_id)
        blobs.append(encode_mp3(rate, kbps, frames, mono))
    table = pa.table(
        {"doc_id": pa.array(ids, type=pa.int64()),
         "mp3": pa.array(blobs, type=pa.binary())}
    )
    fd, tmp = tempfile.mkstemp(
        dir=os.path.dirname(MP3_FIXTURE_PATH), suffix=".parquet.tmp"
    )
    os.close(fd)
    try:
        pq.write_table(table, tmp)
        os.replace(tmp, MP3_FIXTURE_PATH)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    return MP3_FIXTURE_PATH


def mp4_params(doc_id: int) -> tuple[int, int, int]:
    """Fixture MP4 parameters (timescale, duration, n_tracks): pure
    function of doc_id; durations exercise the integer-division ms
    arithmetic, track counts sweep 1..3."""
    return (
        (600, 1000, 90000)[doc_id % 3],
        1000 + (doc_id * 97) % 500000,
        1 + doc_id % 3,
    )


def ensure_mp4_fixture() -> str:
    """Create MP4_FIXTURE_PATH if missing; return the path. One spec-valid
    ISO BMFF container per doc_id (real encode_mp4 — exact box sizes,
    v0 mvhd, tkhd-bearing traks, constant-byte mdat so the oracle's
    trak-count substring scan cannot alias on media bytes). The writer's
    canonical layout (ftyp 24 bytes, moov at 24, mvhd at 32) pins
    timescale/duration at fixed offsets for the SQL oracle. Atomic."""
    if os.path.exists(MP4_FIXTURE_PATH):
        return MP4_FIXTURE_PATH

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ..functions.multimodal import encode_mp4

    n_docs = _max_doc_id() + 1
    ids, blobs = [], []
    for doc_id in range(n_docs):
        ts, dur, tracks = mp4_params(doc_id)
        ids.append(doc_id)
        blobs.append(encode_mp4(ts, dur, tracks, b"\xaa" * (16 + doc_id % 64)))
    table = pa.table(
        {"doc_id": pa.array(ids, type=pa.int64()),
         "mp4": pa.array(blobs, type=pa.binary())}
    )
    fd, tmp = tempfile.mkstemp(
        dir=os.path.dirname(MP4_FIXTURE_PATH), suffix=".parquet.tmp"
    )
    os.close(fd)
    try:
        pq.write_table(table, tmp)
        os.replace(tmp, MP4_FIXTURE_PATH)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    return MP4_FIXTURE_PATH


def jpeg_px_blocks(doc_id: int) -> tuple[int, int]:
    """Pixel-fixture block grid (blocks_wide, blocks_high): images are
    8*bw x 8*bh, constant within each 8x8 block — the baseline-JPEG
    lossless subspace under a flat quantization table, so the REAL
    encoder/decoder round-trip is bit-exact and the SQL oracle can
    recompute pixel stats from the block-value formula."""
    return 1 + doc_id % 6, 1 + (doc_id * 3) % 4


def ensure_jpeg_px_fixture() -> str:
    """Create JPEG_PX_FIXTURE_PATH if missing; return the path. One REAL
    baseline JPEG per doc_id — full DCT/quant/Huffman pipeline
    (functions/jpegcodec.encode_jpeg_pixels, flat table) over a
    block-constant image whose block k value is png_payload(doc_id)[k].
    The engine recovers the pixels by true entropy decode + IDCT; the
    oracle recomputes the stats from the formula. Atomic."""
    if os.path.exists(JPEG_PX_FIXTURE_PATH):
        return JPEG_PX_FIXTURE_PATH

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ..functions.jpegcodec import FLAT_QT, encode_jpeg_pixels

    n_docs = _max_doc_id() + 1
    ids, blobs = [], []
    for doc_id in range(n_docs):
        bw, bh = jpeg_px_blocks(doc_id)
        vals = np.frombuffer(
            png_payload(doc_id, bw * bh), dtype=np.uint8
        ).reshape(bh, bw)
        img = np.kron(vals, np.ones((8, 8), dtype=np.uint8))
        ids.append(doc_id)
        blobs.append(encode_jpeg_pixels(img, FLAT_QT))
    table = pa.table(
        {"doc_id": pa.array(ids, type=pa.int64()),
         "jpeg": pa.array(blobs, type=pa.binary())}
    )
    fd, tmp = tempfile.mkstemp(
        dir=os.path.dirname(JPEG_PX_FIXTURE_PATH), suffix=".parquet.tmp"
    )
    os.close(fd)
    try:
        pq.write_table(table, tmp)
        os.replace(tmp, JPEG_PX_FIXTURE_PATH)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    return JPEG_PX_FIXTURE_PATH


def gif_dims(doc_id: int) -> tuple[int, int]:
    """GIF pixel-fixture dimensions — a third stride so PNG/JPEG/GIF
    blobs never agree by coincidence."""
    return 1 + doc_id % 50, 1 + (doc_id * 5) % 40


def ensure_gif_fixture() -> str:
    """Create GIF_FIXTURE_PATH if missing; return the path. One REAL
    GIF89a per doc_id (encode_gif — real LZW compression, grayscale
    palette), pixels from the shared Knuth-hash stream. GIF is LOSSLESS,
    so unlike JPEG no content restriction is needed: arbitrary formula
    pixels round-trip bit-exactly and the SQL oracle recomputes stats
    straight from the formula. Atomic."""
    if os.path.exists(GIF_FIXTURE_PATH):
        return GIF_FIXTURE_PATH

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ..functions.gifcodec import encode_gif

    n_docs = _max_doc_id() + 1
    ids, blobs = [], []
    for doc_id in range(n_docs):
        w, h = gif_dims(doc_id)
        ids.append(doc_id)
        blobs.append(encode_gif(w, h, png_payload(doc_id, w * h)))
    table = pa.table(
        {"doc_id": pa.array(ids, type=pa.int64()),
         "gif": pa.array(blobs, type=pa.binary())}
    )
    fd, tmp = tempfile.mkstemp(
        dir=os.path.dirname(GIF_FIXTURE_PATH), suffix=".parquet.tmp"
    )
    os.close(fd)
    try:
        pq.write_table(table, tmp)
        os.replace(tmp, GIF_FIXTURE_PATH)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    return GIF_FIXTURE_PATH


GIF_ANIM_FIXTURE_PATH = os.path.join(
    tempfile.gettempdir(), "ofs-gif-anim-fixture-v1.parquet"
)


def gif_anim_params(doc_id: int) -> tuple[int, list[int]]:
    """Animated-GIF fixture parameters: (frame count, per-frame GCE
    delays in centiseconds) — pure doc_id formulas so the SQL oracle can
    recompute frame count and total duration without opening the blob."""
    n_frames = 1 + doc_id % 4
    return n_frames, [3 + (doc_id + 7 * i) % 12 for i in range(n_frames)]


def ensure_gif_anim_fixture() -> str:
    """Create GIF_ANIM_FIXTURE_PATH if missing; return the path. One
    REAL multi-frame GIF89a per doc_id (encode_animated_gif — a GCE +
    LZW-compressed full frame per frame, plus the NETSCAPE2.0 loop
    extension), dims from gif_dims, frame count/delays from
    gif_anim_params. Atomic."""
    if os.path.exists(GIF_ANIM_FIXTURE_PATH):
        return GIF_ANIM_FIXTURE_PATH

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ..functions.gifcodec import encode_animated_gif

    n_docs = _max_doc_id() + 1
    ids, blobs = [], []
    for doc_id in range(n_docs):
        w, h = gif_dims(doc_id)
        n_frames, delays = gif_anim_params(doc_id)
        frames = [png_payload(doc_id * 31 + i, w * h) for i in range(n_frames)]
        ids.append(doc_id)
        blobs.append(encode_animated_gif(w, h, frames, delays))
    table = pa.table(
        {"doc_id": pa.array(ids, type=pa.int64()),
         "gif": pa.array(blobs, type=pa.binary())}
    )
    fd, tmp = tempfile.mkstemp(
        dir=os.path.dirname(GIF_ANIM_FIXTURE_PATH), suffix=".parquet.tmp"
    )
    os.close(fd)
    try:
        pq.write_table(table, tmp)
        os.replace(tmp, GIF_ANIM_FIXTURE_PATH)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    return GIF_ANIM_FIXTURE_PATH


def mp4_frame_params(doc_id: int) -> tuple[int, list[int], list[int]]:
    """Fixture sample-table parameters: (media timescale, per-sample
    durations, per-sample payload lengths) — all pure functions of doc_id
    so the DuckDB oracle can regenerate them in SQL. 2..7 samples per
    container (exercises short/full/multi-chunk stsc layouts)."""
    timescale = (600, 1000, 90000)[doc_id % 3]
    n = 2 + doc_id % 6
    durations = [100 + ((doc_id * 7 + i * 13) % 400) for i in range(n)]
    lengths = [8 + ((doc_id + 3 * i) % 24) for i in range(n)]
    return timescale, durations, lengths


def mp4_frame_payload(doc_id: int, i: int, n: int) -> bytes:
    """Frame i's payload bytes: the shared Knuth-hash stream salted by
    (doc_id, frame index) — byte j = (doc_id*2654435761 + i*1000003 +
    j*40503) mod 256, the exact formula the SQL oracle re-evaluates."""
    idx = np.arange(n, dtype=np.uint64)
    return (
        (
            np.uint64(doc_id) * np.uint64(2654435761)
            + np.uint64(i) * np.uint64(1000003)
            + idx * np.uint64(40503)
        )
        .astype(np.uint8)
        .tobytes()
    )


def ensure_mp4_frames_fixture() -> str:
    """Create MP4_FRAMES_FIXTURE_PATH if missing; return the path. One
    REAL fragmentless MP4 per doc_id with a full sample table
    (encode_mp4_samples — stts/stsc/stsz/stco pointing into mdat), frame
    payloads from mp4_frame_payload. The engine locates the frames by
    demuxing the container; the oracle recomputes the same per-frame
    stats from the generative formula — two independent routes to the
    same bytes. Atomic like the PNG path."""
    if os.path.exists(MP4_FRAMES_FIXTURE_PATH):
        return MP4_FRAMES_FIXTURE_PATH

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ..functions.multimodal import encode_mp4_samples

    n_docs = _max_doc_id() + 1
    ids, blobs = [], []
    for doc_id in range(n_docs):
        ts, durations, lengths = mp4_frame_params(doc_id)
        samples = [
            mp4_frame_payload(doc_id, i, ln) for i, ln in enumerate(lengths)
        ]
        ids.append(doc_id)
        blobs.append(encode_mp4_samples(ts, durations, samples))
    table = pa.table(
        {"doc_id": pa.array(ids, type=pa.int64()),
         "mp4": pa.array(blobs, type=pa.binary())}
    )
    fd, tmp = tempfile.mkstemp(
        dir=os.path.dirname(MP4_FRAMES_FIXTURE_PATH), suffix=".parquet.tmp"
    )
    os.close(fd)
    try:
        pq.write_table(table, tmp)
        os.replace(tmp, MP4_FRAMES_FIXTURE_PATH)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    return MP4_FRAMES_FIXTURE_PATH


def png_palette_rgb(n_colors: int) -> bytes:
    """Fixture palette: flat RGB triples from a fixed integer formula —
    entry j is ((j*3)%256, (j*5+1)%256, (j*7+2)%256). Shared verbatim
    with the DuckDB oracle so the palette lookup itself is checked."""
    return bytes(
        b
        for j in range(n_colors)
        for b in ((j * 3) % 256, (j * 5 + 1) % 256, (j * 7 + 2) % 256)
    )


def png_palette_indices(doc_id: int, n: int, n_colors: int) -> bytes:
    """Fixture palette-index stream: the png_payload Knuth-hash formula
    reduced mod the palette size."""
    idx = np.arange(n, dtype=np.uint64)
    return (
        (
            (np.uint64(doc_id) * np.uint64(2654435761) + idx * np.uint64(40503))
            % np.uint64(n_colors)
        )
        .astype(np.uint8)
        .tobytes()
    )


def ensure_png_palette_fixture() -> str:
    """Create PNG_PALETTE_FIXTURE_PATH if missing; return the path.
    Three arms by doc_id % 3, covering the two real-crawl PNG shapes the
    v1 fixture lacked (VERDICT r3 #7): (0) 256-color 8-bit paletted,
    (1) 16-color 4-bit paletted (sub-byte scanline packing), (2) Adam7
    progressive grayscale. All stay in the lossless subspace, so the
    oracle recomputes every pixel from the generative formula."""
    if os.path.exists(PNG_PALETTE_FIXTURE_PATH):
        return PNG_PALETTE_FIXTURE_PATH

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ..functions.multimodal import (
        encode_png_adam7,
        encode_png_palette,
    )

    n_docs = _max_doc_id() + 1
    ids, blobs = [], []
    for doc_id in range(n_docs):
        w, h = png_dims(doc_id)
        arm = doc_id % 3
        if arm == 2:
            blob = encode_png_adam7(w, h, png_payload(doc_id, w * h))
        else:
            n_colors = 16 if arm == 1 else 256
            blob = encode_png_palette(
                w,
                h,
                png_palette_indices(doc_id, w * h, n_colors),
                png_palette_rgb(n_colors),
                bit_depth=4 if arm == 1 else 8,
            )
        ids.append(doc_id)
        blobs.append(blob)
    table = pa.table(
        {"doc_id": pa.array(ids, type=pa.int64()),
         "png": pa.array(blobs, type=pa.binary())}
    )
    fd, tmp = tempfile.mkstemp(
        dir=os.path.dirname(PNG_PALETTE_FIXTURE_PATH), suffix=".parquet.tmp"
    )
    os.close(fd)
    try:
        pq.write_table(table, tmp)
        os.replace(tmp, PNG_PALETTE_FIXTURE_PATH)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    return PNG_PALETTE_FIXTURE_PATH


def png16_samples(doc_id: int, n: int) -> bytes:
    """Fixture 16-bit sample stream: the png_payload Knuth-hash formula
    kept mod 2^16 and serialized big-endian (RFC 2083 network byte
    order) — shared verbatim with the DuckDB oracle."""
    idx = np.arange(n, dtype=np.uint64)
    return (
        (
            (np.uint64(doc_id) * np.uint64(2654435761)
             + idx * np.uint64(40503))
            % np.uint64(65536)
        )
        .astype(">u2")
        .tobytes()
    )


def jpeg_color_planes(doc_id: int):
    """Fixture YCbCr planes for one color JPEG (VERDICT r4 #1), all in
    the codec's lossless subspace: whole-block luma dims, each plane
    constant within its OWN 8x8 blocks, values from per-plane Knuth-hash
    formulas (strides 40503 / 48271 / 69621, offsets 0 / 7 / 13) shared
    verbatim with the DuckDB oracle. Arm = doc_id % 2: 0 -> 4:4:4,
    1 -> 4:2:0 (chroma planes at half resolution). Returns
    (Y, Cb, Cr, sampling)."""
    w, h = 8 * (1 + doc_id % 6), 8 * (1 + (doc_id * 3) % 4)
    arm = doc_id % 2
    K = np.uint64(2654435761)

    def blocks(nby: int, nbx: int, stride: int, off: int) -> np.ndarray:
        idx = np.arange(nby * nbx, dtype=np.uint64)
        vals = (np.uint64(doc_id) * K + idx * np.uint64(stride)
                + np.uint64(off)) % np.uint64(256)
        return vals.astype(np.uint8).reshape(nby, nbx)

    nby, nbx = h // 8, w // 8
    Y = blocks(nby, nbx, 40503, 0).repeat(8, 0).repeat(8, 1)
    if arm == 1:
        ch, cw = h // 2, w // 2
        cby, cbx = (ch + 7) // 8, (cw + 7) // 8
        sampling = (2, 2)
    else:
        ch, cw, cby, cbx = h, w, nby, nbx
        sampling = (1, 1)
    CB = blocks(cby, cbx, 48271, 7).repeat(8, 0).repeat(8, 1)[:ch, :cw]
    CR = blocks(cby, cbx, 69621, 13).repeat(8, 0).repeat(8, 1)[:ch, :cw]
    return Y, CB, CR, sampling


def ensure_jpeg_color_fixture() -> str:
    """Create JPEG_COLOR_FIXTURE_PATH if missing; return the path. Real
    baseline COLOR JPEGs (interleaved-MCU YCbCr scan, two DQTs, four
    DHTs) with flat quantization tables so the decode is bit-exact.
    Every fifth doc is encoded PROGRESSIVE (SOF2, the full successive
    approximation + spectral-selection scan script — the layout web
    optimizers emit); every third remaining doc carries a DRI restart
    interval of 2 MCUs (RSTn markers + per-ECS DC predictor resets,
    T.81 E.1.4 — the shape camera/wasm encoders emit). Both change only
    the BYTE STREAM, never the decoded pixels, so all arms share the
    same oracle formulas while the Spark route walks real multi-scan /
    restart-marker syntax."""
    if os.path.exists(JPEG_COLOR_FIXTURE_PATH):
        return JPEG_COLOR_FIXTURE_PATH

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ..functions.jpegcodec import (
        FLAT_QT,
        encode_jpeg_progressive,
        encode_jpeg_ycc,
    )

    n_docs = _max_doc_id() + 1
    ids, blobs = [], []
    for doc_id in range(n_docs):
        Y, CB, CR, sampling = jpeg_color_planes(doc_id)
        if doc_id % 5 == 0:
            blob = encode_jpeg_progressive(
                Y, CB, CR, sampling=sampling,
                qtable=FLAT_QT, qtable_chroma=FLAT_QT,
            )
        else:
            blob = encode_jpeg_ycc(
                Y, CB, CR, sampling=sampling,
                qtable=FLAT_QT, qtable_chroma=FLAT_QT,
                restart_interval=2 if doc_id % 3 == 0 else 0,
            )
        blobs.append(blob)
        ids.append(doc_id)
    table = pa.table(
        {"doc_id": pa.array(ids, type=pa.int64()),
         "jpeg": pa.array(blobs, type=pa.binary())}
    )
    fd, tmp = tempfile.mkstemp(
        dir=os.path.dirname(JPEG_COLOR_FIXTURE_PATH), suffix=".parquet.tmp"
    )
    os.close(fd)
    try:
        pq.write_table(table, tmp)
        os.replace(tmp, JPEG_COLOR_FIXTURE_PATH)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    return JPEG_COLOR_FIXTURE_PATH


def ensure_png16_fixture() -> str:
    """Create PNG16_FIXTURE_PATH if missing; return the path. Two arms
    by doc_id % 2 (VERDICT r4 #5): (0) 16-bit grayscale, (1) 16-bit
    truecolor RGB — 2-byte big-endian samples through the same unfilter
    path (fdist 2 resp. 6). Lossless subspace: the oracle recomputes
    every sample from the generative formula."""
    if os.path.exists(PNG16_FIXTURE_PATH):
        return PNG16_FIXTURE_PATH

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ..functions.multimodal import encode_png

    n_docs = _max_doc_id() + 1
    ids, blobs = [], []
    for doc_id in range(n_docs):
        w, h = png_dims(doc_id)
        color_type = 2 if doc_id % 2 else 0
        n_samples = w * h * (3 if color_type == 2 else 1)
        blobs.append(
            encode_png(
                w, h, png16_samples(doc_id, n_samples),
                bit_depth=16, color_type=color_type,
            )
        )
        ids.append(doc_id)
    table = pa.table(
        {"doc_id": pa.array(ids, type=pa.int64()),
         "png": pa.array(blobs, type=pa.binary())}
    )
    fd, tmp = tempfile.mkstemp(
        dir=os.path.dirname(PNG16_FIXTURE_PATH), suffix=".parquet.tmp"
    )
    os.close(fd)
    try:
        pq.write_table(table, tmp)
        os.replace(tmp, PNG16_FIXTURE_PATH)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    return PNG16_FIXTURE_PATH


def ensure_jpeg_exif_fixture() -> str:
    """Create JPEG_EXIF_FIXTURE_PATH if missing; return the path. JFIF
    streams with an APP1 Exif segment (TIFF IFD0 Orientation) spliced
    after SOI: orientation = 1 + (doc_id*7) % 8 covering all eight
    values, byte order alternating II/little / MM/big by doc parity,
    and every fourth doc carrying NO EXIF at all (consumers default to
    orientation 1). Dimension formulas shared verbatim with the DuckDB
    oracle."""
    if os.path.exists(JPEG_EXIF_FIXTURE_PATH):
        return JPEG_EXIF_FIXTURE_PATH

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ..functions.multimodal import encode_app1_exif, encode_jpeg

    n_docs = _max_doc_id() + 1
    ids, blobs = [], []
    for doc_id in range(n_docs):
        w = 8 * (1 + doc_id % 4)
        h = 8 * (1 + (doc_id * 5) % 3)
        blob = encode_jpeg(w, h, b"x" * (1 + doc_id % 7))
        if doc_id % 4 != 3:
            app1 = encode_app1_exif(
                1 + (doc_id * 7) % 8, "II" if doc_id % 2 == 0 else "MM"
            )
            blob = blob[:2] + app1 + blob[2:]
        blobs.append(blob)
        ids.append(doc_id)
    table = pa.table(
        {"doc_id": pa.array(ids, type=pa.int64()),
         "jpeg": pa.array(blobs, type=pa.binary())}
    )
    fd, tmp = tempfile.mkstemp(
        dir=os.path.dirname(JPEG_EXIF_FIXTURE_PATH), suffix=".parquet.tmp"
    )
    os.close(fd)
    try:
        pq.write_table(table, tmp)
        os.replace(tmp, JPEG_EXIF_FIXTURE_PATH)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    return JPEG_EXIF_FIXTURE_PATH


def ensure_png_fixture() -> str:
    """Create PNG_FIXTURE_PATH if missing; return the path. Safe under
    concurrent callers (atomic rename; losers overwrite with identical
    bytes — the content is deterministic)."""
    if os.path.exists(PNG_FIXTURE_PATH):
        return PNG_FIXTURE_PATH

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ..functions.multimodal import encode_png

    n_docs = _max_doc_id() + 1
    ids, blobs = [], []
    for doc_id in range(n_docs):
        w, h = png_dims(doc_id)
        ids.append(doc_id)
        blobs.append(encode_png(w, h, png_payload(doc_id, w * h)))
    table = pa.table(
        {"doc_id": pa.array(ids, type=pa.int64()),
         "png": pa.array(blobs, type=pa.binary())}
    )
    fd, tmp = tempfile.mkstemp(
        dir=os.path.dirname(PNG_FIXTURE_PATH), suffix=".parquet.tmp"
    )
    os.close(fd)
    try:
        pq.write_table(table, tmp)
        os.replace(tmp, PNG_FIXTURE_PATH)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    return PNG_FIXTURE_PATH
