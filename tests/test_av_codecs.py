"""Golden tests for the REAL MP3 frame-chain and MP4 box-walker codecs
(functions/multimodal.py). Same independence discipline as the PNG/JPEG
codec tests: parsers are exercised on HAND-SPELLED byte streams covering
arms the canonical encoders never emit (VBR chains, ID3v2 tags, mvhd
version 1, largesize and to-EOF boxes), so parser correctness does not
ride on the encoder."""

from __future__ import annotations

import struct

import pytest

from opps_feedcrawler_spark.functions.multimodal import (
    decode_audio_meta,
    encode_mp3,
    encode_mp4,
    parse_mp3_meta,
    parse_mp4_meta,
)


def _frame(kbps_idx: int, sr_idx: int, mono: bool, pad: int = 0) -> bytes:
    """Hand-build one MPEG-1 Layer III frame from raw header fields."""
    rates = (44100, 48000, 32000)
    brs = (None, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
    flen = 144 * brs[kbps_idx] * 1000 // rates[sr_idx] + pad
    hdr = bytes([0xFF, 0xFB, (kbps_idx << 4) | (sr_idx << 2) | (pad << 1),
                 0xC0 if mono else 0x00])
    return hdr + b"\x11" * (flen - 4)


class TestMp3:
    def test_hand_spelled_cbr_chain(self):
        blob = _frame(9, 0, True) * 5  # 128 kbps, 44100, mono
        meta = parse_mp3_meta(blob)
        assert meta == {
            "sample_rate": 44100,
            "n_channels": 1,
            "n_frames": 5,
            "duration_ms": 5 * 1152 * 1000 // 44100,
        }

    def test_vbr_chain_counts_by_per_frame_length(self):
        # three frames at three different bitrates — only a real walk
        # (each frame's length from its own header) counts them right
        blob = _frame(5, 1, False) + _frame(14, 1, False) + _frame(9, 1, False)
        meta = parse_mp3_meta(blob)
        assert meta["n_frames"] == 3
        assert meta["sample_rate"] == 48000
        assert meta["n_channels"] == 2

    def test_padding_bit_advances_one_extra_byte(self):
        blob = _frame(9, 0, True, pad=1) + _frame(9, 0, True)
        assert parse_mp3_meta(blob)["n_frames"] == 2

    def test_id3v2_tag_skipped_syncsafe(self):
        tag_body = b"\x00" * 200
        # syncsafe 200 = 0b0000001_0x48 -> bytes (0,0,1,72)
        tag = b"ID3" + bytes([3, 0, 0]) + bytes([0, 0, 1, 72]) + tag_body
        assert len(tag_body) == ((1 << 7) | 72)
        blob = tag + _frame(9, 0, True) * 2
        assert parse_mp3_meta(blob)["n_frames"] == 2

    def test_rejects_malformed(self):
        with pytest.raises(ValueError):
            parse_mp3_meta(b"RIFFxxxxWAVE")  # no sync
        with pytest.raises(ValueError):
            parse_mp3_meta(bytes([0xFF, 0xFB, 0xF0, 0x00]) + b"\x00" * 100)  # bad br idx
        with pytest.raises(ValueError):
            parse_mp3_meta(bytes([0xFF, 0xF3, 0x94, 0x00]))  # MPEG-2 (unsupported)

    def test_encoder_roundtrip_sweep(self):
        for rate in (44100, 48000, 32000):
            for kbps in (64, 128, 320):
                for mono in (True, False):
                    blob = encode_mp3(rate, kbps, 7, mono)
                    meta = parse_mp3_meta(blob)
                    assert meta["n_frames"] == 7
                    assert meta["sample_rate"] == rate
                    assert meta["n_channels"] == (1 if mono else 2)

    def test_decode_audio_meta_dispatches_mp3_for_real(self):
        blob = encode_mp3(32000, 64, 11)
        meta = decode_audio_meta(blob)
        assert meta["codec"] == "mp3"
        assert meta["sample_rate"] == 32000
        assert meta["duration_ms"] == 11 * 1152 * 1000 // 32000


def _box(typ: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + typ + payload


class TestMp4:
    def test_encoder_roundtrip_sweep(self):
        for ts, dur, tracks in [(600, 1000, 1), (90000, 123456, 3), (1000, 0, 0)]:
            meta = parse_mp4_meta(encode_mp4(ts, dur, tracks, b"\xaa" * 9))
            assert meta["timescale"] == ts
            assert meta["duration"] == dur
            assert meta["n_tracks"] == tracks
            assert meta["duration_ms"] == dur * 1000 // ts
            assert meta["major_brand"] == "isom"

    def test_hand_spelled_mvhd_version1(self):
        # v1 mvhd: 64-bit creation/modification/duration, u32 timescale
        mvhd = (
            b"\x01\x00\x00\x00"
            + struct.pack(">QQ", 0, 0)
            + struct.pack(">I", 48000)
            + struct.pack(">Q", 96000)
            + b"\x00" * 80
        )
        blob = (
            _box(b"ftyp", b"isom" + b"\x00" * 8)
            + _box(b"moov", _box(b"mvhd", mvhd))
        )
        meta = parse_mp4_meta(blob)
        assert meta["timescale"] == 48000
        assert meta["duration"] == 96000
        assert meta["duration_ms"] == 2000

    def test_largesize_and_to_eof_boxes(self):
        mvhd = (
            b"\x00\x00\x00\x00" + struct.pack(">II", 0, 0)
            + struct.pack(">II", 1000, 2500) + b"\x00" * 80
        )
        moov = _box(b"moov", _box(b"mvhd", mvhd))
        # wrap mdat as a largesize box, then a to-EOF free box (size 0)
        payload = b"\xbb" * 32
        mdat = struct.pack(">I", 1) + b"mdat" + struct.pack(">Q", 16 + len(payload)) + payload
        free = struct.pack(">I", 0) + b"free" + b"\xcc" * 5
        blob = _box(b"ftyp", b"isom" + b"\x00" * 8) + moov + mdat + free
        meta = parse_mp4_meta(blob)
        assert meta["duration_ms"] == 2500
        assert meta["n_tracks"] == 0

    def test_rejects_malformed(self):
        with pytest.raises(ValueError):
            parse_mp4_meta(b"\x00\x00\x00\x08fre")  # no ftyp / truncated
        with pytest.raises(ValueError):
            parse_mp4_meta(_box(b"ftyp", b"isom" + b"\x00" * 8))  # no moov
        # box claiming more bytes than exist
        bad = _box(b"ftyp", b"isom" + b"\x00" * 8) + struct.pack(">I", 999) + b"moov"
        with pytest.raises(ValueError):
            parse_mp4_meta(bad)


class TestMp4SampleTable:
    """encode_mp4_samples / parse_mp4_samples: the REAL demux pair. The
    parser is additionally validated against a hand-assembled stbl (built
    box-by-box from ISO 14496-12 field layouts, not by the encoder) so
    decoder correctness does not depend on the encoder."""

    def test_roundtrip_offsets_sizes_dts(self):
        from opps_feedcrawler_spark.functions.multimodal import (
            encode_mp4_samples,
            parse_mp4_samples,
        )

        samples = [bytes([40 + i]) * (3 + i) for i in range(8)]
        durs = [10, 10, 20, 20, 20, 5, 5, 40]
        blob = encode_mp4_samples(90000, durs, samples)
        (track,) = parse_mp4_samples(blob)
        assert track["timescale"] == 90000
        assert [blob[o : o + s] for o, s, _ in track["samples"]] == samples
        exp_dts = [0, 10, 20, 40, 60, 80, 85, 90]
        assert [d for _, _, d in track["samples"]] == exp_dts

    def test_hand_assembled_stbl(self):
        from opps_feedcrawler_spark.functions.multimodal import (
            parse_mp4_samples,
        )

        def full(t, payload, version=0, flags=0):
            body = bytes([version]) + flags.to_bytes(3, "big") + payload
            return struct.pack(">I", 8 + len(body)) + t + body

        # 3 samples of sizes 4/5/6 in 2 chunks (2 + 1), deltas 100 each,
        # media timescale 1000; chunk offsets chosen inside a fake mdat
        stts = full(b"stts", struct.pack(">III", 1, 3, 100))
        stsc = full(
            b"stsc", struct.pack(">I", 2) + struct.pack(">III", 1, 2, 1)
            + struct.pack(">III", 2, 1, 1)
        )
        stsz = full(b"stsz", struct.pack(">II", 0, 3) + struct.pack(">III", 4, 5, 6))
        stco = full(b"stco", struct.pack(">III", 2, 40, 49))
        stbl = _box(b"stbl", stts + stsc + stsz + stco)
        mdhd = full(b"mdhd", struct.pack(">IIII", 0, 0, 1000, 300) + struct.pack(">HH", 0, 0))
        minf = _box(b"minf", stbl)
        mdia = _box(b"mdia", mdhd + minf)
        trak = _box(b"trak", mdia)
        mvhd = full(b"mvhd", struct.pack(">IIII", 0, 0, 1000, 300) + b"\x00" * 80)
        ftyp = _box(b"ftyp", b"isom" + b"\x00" * 8)
        mdat = _box(b"mdat", bytes(range(100)))
        blob = ftyp + mdat + _box(b"moov", mvhd + trak)
        (track,) = parse_mp4_samples(blob)
        assert track["timescale"] == 1000
        assert track["samples"] == [(40, 4, 0), (44, 5, 100), (49, 6, 200)]

    def test_tracks_without_stbl_are_skipped(self):
        from opps_feedcrawler_spark.functions.multimodal import (
            encode_mp4,
            parse_mp4_samples,
        )

        # metadata-only writer emits traks with no mdia/stbl
        assert parse_mp4_samples(encode_mp4(600, 1200, 2, b"\xaa" * 8)) == []

    def test_uniform_sampling_policy(self):
        from opps_feedcrawler_spark.functions.multimodal import (
            _uniform_indices,
        )

        assert _uniform_indices(3, 5) == [0, 1, 2]
        assert _uniform_indices(5, 5) == [0, 1, 2, 3, 4]
        assert _uniform_indices(100, 5) == [0, 24, 49, 74, 99]
        idx = _uniform_indices(7, 5)
        assert idx[0] == 0 and idx[-1] == 6 and idx == sorted(set(idx))


def test_sample_video_frames_real_mp4(spark):
    """The frame-sampling stage is REAL for demuxable MP4s: frame_ms from
    the true stts timestamps, frame_hash = crc32 of the true mdat slices;
    non-MP4 blobs keep the declared deterministic stub."""
    import zlib as _z

    from opps_feedcrawler_spark.functions.multimodal import (
        encode_mp4_samples,
        sample_video_frames,
    )

    samples = [bytes([i * 17 + 1]) * (4 + i) for i in range(4)]
    blob = encode_mp4_samples(1000, [500, 500, 250, 250], samples)
    df = spark.createDataFrame(
        [("v1", blob), ("v2", b"not-a-video")], "url string, blob binary"
    )
    rows = {}
    for r in sample_video_frames(df).collect():
        rows.setdefault(r.url, []).append(r)
    real = sorted(rows["v1"], key=lambda r: r.frame_idx)
    assert [r.frame_ms for r in real] == [0, 500, 1000, 1250]
    assert [r.frame_hash for r in real] == [_z.crc32(s) for s in samples]
    # stub arm unchanged for non-containers
    assert len(rows["v2"]) == 1 + len(b"not-a-video") % 5


class TestMp4StreamSuppliedCountBounds:
    """ADVICE r3: stream-supplied table counts must be bounded against
    their enclosing box (a corrupted stts run count like 0x7FFFFFFF
    previously drove a multi-billion-entry list build), and torn boxes
    raise struct.error which the stage-level quarantine must absorb."""

    @staticmethod
    def _full(t, payload, version=0, flags=0):
        body = bytes([version]) + flags.to_bytes(3, "big") + payload
        return struct.pack(">I", 8 + len(body)) + t + body

    def _blob_with_stbl(self, stts=None, stsc=None, stsz=None, stco=None):
        full = self._full
        stts = stts if stts is not None else full(
            b"stts", struct.pack(">III", 1, 3, 100))
        stsc = stsc if stsc is not None else full(
            b"stsc", struct.pack(">I", 1) + struct.pack(">III", 1, 3, 1))
        stsz = stsz if stsz is not None else full(
            b"stsz", struct.pack(">II", 0, 3) + struct.pack(">III", 4, 5, 6))
        stco = stco if stco is not None else full(
            b"stco", struct.pack(">II", 1, 40))
        stbl = _box(b"stbl", stts + stsc + stsz + stco)
        mdhd = self._full(
            b"mdhd", struct.pack(">IIII", 0, 0, 1000, 300) + struct.pack(">HH", 0, 0))
        trak = _box(b"trak", _box(b"mdia", mdhd + _box(b"minf", stbl)))
        mvhd = self._full(b"mvhd", struct.pack(">IIII", 0, 0, 1000, 300) + b"\x00" * 80)
        return (
            _box(b"ftyp", b"isom" + b"\x00" * 8)
            + _box(b"mdat", bytes(range(100)))
            + _box(b"moov", mvhd + trak)
        )

    def test_corrupt_counts_raise_fast_not_hang(self):
        import time

        from opps_feedcrawler_spark.functions.multimodal import (
            parse_mp4_samples,
        )

        full = self._full
        huge = 0x7FFFFFFF
        corrupt = {
            # stts run count far beyond box capacity (8 bytes/entry)
            "stts": full(b"stts", struct.pack(">III", huge, 3, 100)),
            # one stts run claiming more samples than the file has bytes
            "stts2": full(b"stts", struct.pack(">III", 1, huge, 100)),
            # uniform stsz claiming billions of samples
            "stsz": full(b"stsz", struct.pack(">II", 4, huge)),
            # per-sample stsz table count beyond box capacity (4 B/entry)
            "stsz2": full(b"stsz", struct.pack(">II", 0, huge)),
            # stco chunk count beyond box capacity
            "stco": full(b"stco", struct.pack(">II", huge, 40)),
            # stsc run count beyond box capacity (12 bytes/entry)
            "stsc": full(b"stsc", struct.pack(">I", huge)
                         + struct.pack(">III", 1, 3, 1)),
        }
        for name, box_bytes in corrupt.items():
            kw = {name.rstrip("2"): box_bytes}
            blob = self._blob_with_stbl(**kw)
            t0 = time.monotonic()
            with pytest.raises(ValueError):
                parse_mp4_samples(blob)
            assert time.monotonic() - t0 < 1.0, f"{name} parse not bounded"

    def test_valid_tables_still_parse_after_bounding(self):
        from opps_feedcrawler_spark.functions.multimodal import (
            parse_mp4_samples,
        )

        (track,) = parse_mp4_samples(self._blob_with_stbl())
        assert [s for _, s, _ in track["samples"]] == [4, 5, 6]

    def test_torn_mvhd_is_quarantined_not_raised(self, spark):
        """A moov/mvhd shorter than its v0 field layout raises
        struct.error from parse_mp4_meta; the video_metadata stage must
        quarantine it as container='invalid' (one torn blob cannot fail
        a 100 TB stage — ADVICE r3)."""
        from opps_feedcrawler_spark.functions.multimodal import (
            parse_mp4_meta,
            video_metadata,
        )

        torn_mvhd = self._full(b"mvhd", struct.pack(">I", 0))  # 4-byte body
        blob = (
            _box(b"ftyp", b"isom" + b"\x00" * 8) + _box(b"moov", torn_mvhd)
        )
        with pytest.raises((ValueError, struct.error)):
            parse_mp4_meta(blob)
        df = spark.createDataFrame([("u1", blob)], "url string, blob binary")
        (row,) = video_metadata(df).collect()
        assert row.container == "invalid" and row.n_tracks == 0

    def test_corrupt_counts_quarantined_in_frame_stage(self, spark):
        from opps_feedcrawler_spark.functions.multimodal import (
            sample_video_frames,
            video_frame_stats,
        )

        huge_stts = self._full(
            b"stts", struct.pack(">III", 0x7FFFFFFF, 3, 100))
        blob = self._blob_with_stbl(stts=huge_stts)
        df = spark.createDataFrame([("u1", blob)], "url string, blob binary")
        # frame sampler falls back to the deterministic stub rows
        rows = sample_video_frames(df).collect()
        assert len(rows) == 1 + len(blob) % 5
        # strict stats stage emits nothing for the quarantined blob
        assert video_frame_stats(df).collect() == []
