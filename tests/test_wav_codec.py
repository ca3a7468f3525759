"""Golden tests for the REAL WAV codec (functions/multimodal.py).

Same independence discipline as test_png_codec.py: the parser is
validated against a HAND-SPELLED RIFF/WAVE byte literal (every header
byte written out below from the canonical WAVE layout, not produced by
encode_wav), and the encoder is checked field-by-field against spec
offsets plus a round-trip through the stdlib `wave` reader — a third
implementation neither side shares code with."""

from __future__ import annotations

import io
import struct
import wave

import pytest

from opps_feedcrawler_spark.functions.multimodal import (
    decode_audio_meta,
    encode_wav,
    parse_wav_meta,
)

# Mono 16-bit PCM, 8000 Hz, 4 frames (8 data bytes), spelled byte-for-byte:
#   RIFF size = 4 ("WAVE") + 8+16 (fmt) + 8+8 (data) = 44
HAND_WAV = (
    b"RIFF" + struct.pack("<I", 44) + b"WAVE"
    + b"fmt " + struct.pack("<I", 16)
    + struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    + b"data" + struct.pack("<I", 8)
    + b"\x01\x00\x02\x00\x03\x00\x04\x00"
)


def test_parser_on_hand_spelled_wav():
    meta = parse_wav_meta(HAND_WAV)
    assert meta == {
        "sample_rate": 8000,
        "n_channels": 1,
        "bits": 16,
        "fmt_tag": 1,
        "n_frames": 4,
        "duration_ms": 0,  # 4 frames at 8 kHz -> 0 ms (integer floor)
    }


def test_parser_rejects_malformed():
    with pytest.raises(ValueError):
        parse_wav_meta(b"ID3\x03not a wav")
    with pytest.raises(ValueError):
        parse_wav_meta(HAND_WAV[:10])  # truncated magic
    # RIFF but not WAVE
    with pytest.raises(ValueError):
        parse_wav_meta(b"RIFF" + struct.pack("<I", 4) + b"AVI ")
    # fmt chunk missing entirely
    no_fmt = HAND_WAV[:12] + HAND_WAV[36:]
    with pytest.raises(ValueError, match="fmt"):
        parse_wav_meta(no_fmt)


def test_parser_walks_past_extra_chunks():
    # LIST chunk (odd length -> word-aligned skip) inserted before fmt
    extra = (
        b"RIFF" + struct.pack("<I", 44 + 8 + 6) + b"WAVE"
        + b"LIST" + struct.pack("<I", 5) + b"INFOX" + b"\x00"  # pad byte
        + HAND_WAV[12:]
    )
    assert parse_wav_meta(extra)["sample_rate"] == 8000


def test_encoder_fields_at_spec_offsets():
    blob = encode_wav(44100, 2, b"\x00" * 40, bits=16)
    assert blob[:4] == b"RIFF" and blob[8:12] == b"WAVE"
    assert struct.unpack("<H", blob[22:24])[0] == 2          # channels
    assert struct.unpack("<I", blob[24:28])[0] == 44100      # rate
    assert struct.unpack("<I", blob[28:32])[0] == 44100 * 4  # byte rate
    assert struct.unpack("<H", blob[32:34])[0] == 4          # block align
    assert struct.unpack("<I", blob[40:44])[0] == 40         # data size
    # RIFF size covers everything after the first 8 bytes
    assert struct.unpack("<I", blob[4:8])[0] == len(blob) - 8


def test_encoder_roundtrip_through_stdlib_wave():
    payload = bytes(range(200)) * 2  # 400 bytes -> 100 stereo-16 frames
    blob = encode_wav(16000, 2, payload)
    with wave.open(io.BytesIO(blob)) as w:
        assert w.getframerate() == 16000
        assert w.getnchannels() == 2
        assert w.getsampwidth() == 2
        assert w.getnframes() == 100
        assert w.readframes(100) == payload
    meta = parse_wav_meta(blob)
    assert meta["n_frames"] == 100
    assert meta["duration_ms"] == 100 * 1000 // 16000


def test_decode_audio_meta_wav_real_mp3_stub():
    real = decode_audio_meta(encode_wav(22050, 1, b"\x00" * 441 * 2))
    assert real["codec"] == "wav"
    assert real["sample_rate"] == 22050
    assert real["n_channels"] == 1
    assert real["duration_ms"] == 441 * 1000 // 22050
    bad = decode_audio_meta(b"ID3\x04rest-of-an-mp3")
    # sniffs MP3 but has no valid frame chain -> quarantined, not raised
    assert bad["codec"] == "invalid" and bad["duration_ms"] == 0


def test_decode_wav_samples_real_pcm():
    """PCM reinterpretation: known int16 values round-trip through
    encode_wav bytes, stereo reshapes (frames, 2), 8-bit path works,
    trailing partial frame is dropped like any PCM reader does."""
    import numpy as np

    from opps_feedcrawler_spark.functions.multimodal import (
        decode_wav_samples,
    )

    vals = np.array([0, 1, -1, 32767, -32768, 12345, -54], dtype=np.int16)
    blob = encode_wav(8000, 1, vals.tobytes())
    out = decode_wav_samples(blob)
    assert out.shape == (7, 1)
    assert out[:, 0].tolist() == vals.astype(int).tolist()
    # stereo: interleaved L/R
    st = encode_wav(44100, 2, np.array([1, -2, 3, -4], dtype=np.int16).tobytes())
    assert decode_wav_samples(st).tolist() == [[1, -2], [3, -4]]


def test_audio_waveform_stats_spark(spark):
    import numpy as np

    from opps_feedcrawler_spark.functions.multimodal import (
        audio_waveform_stats,
    )

    vals = np.array([100, -200, 300, -32768], dtype=np.int16)
    blob = encode_wav(16000, 1, vals.tobytes())
    df = spark.createDataFrame([("w1", blob)], "url string, blob binary")
    (r,) = audio_waveform_stats(df).collect()
    assert r.sample_rate == 16000 and r.n_samples == 4
    assert r.sum_abs == 100 + 200 + 300 + 32768
    assert r.peak == 32768
    assert r.dc_sum == 100 - 200 + 300 - 32768


def test_decode_wav_samples_u8_centered():
    """ADVICE r3: 8-bit PCM is unsigned 0..255 per the WAV spec; the
    decoder must center at 128 so amplitudes are zero-centered like the
    int16 path (silence = 0, not 128)."""
    import numpy as np

    from opps_feedcrawler_spark.functions.multimodal import (
        audio_waveform_stats,
        decode_wav_samples,
    )

    raw = bytes([128, 129, 127, 255, 0, 200])
    blob = encode_wav(8000, 1, raw, bits=8)
    out = decode_wav_samples(blob)
    assert out[:, 0].tolist() == [0, 1, -1, 127, -128, 72]


def test_audio_waveform_stats_u8_silence(spark):
    from opps_feedcrawler_spark.functions.multimodal import (
        audio_waveform_stats,
    )

    # stage-level: u8 digital silence (all 128) must score as silence
    silent = encode_wav(8000, 1, bytes([128] * 16), bits=8)
    df = spark.createDataFrame([("w8", silent)], "url string, blob binary")
    (r,) = audio_waveform_stats(df).collect()
    assert r.n_samples == 16 and r.sum_abs == 0 and r.peak == 0 and r.dc_sum == 0


class TestG711:
    """REAL G.711 codec (ITU-T G.711 segment expansion, WAVE fmt tags
    6/7). Decode tables are checked against hand-transcribed spec values
    (the classic telephony reference points), the by-construction
    encoders against the round-trip identity on codes, and the WAV
    dispatch end-to-end."""

    def test_ulaw_spec_golden_values(self):
        from opps_feedcrawler_spark.functions.multimodal import (
            ulaw_to_linear,
        )

        # canonical reference points of the 16-bit-range µ-law table
        assert ulaw_to_linear([0x00]).tolist() == [-32124]  # negative max
        assert ulaw_to_linear([0x80]).tolist() == [32124]   # positive max
        assert ulaw_to_linear([0xFF]).tolist() == [0]       # positive zero
        assert ulaw_to_linear([0x7F]).tolist() == [0]       # negative zero
        assert ulaw_to_linear([0xFE]).tolist() == [8]       # smallest step
        assert ulaw_to_linear([0x7E]).tolist() == [-8]

    def test_alaw_spec_golden_values(self):
        from opps_feedcrawler_spark.functions.multimodal import (
            alaw_to_linear,
        )

        assert alaw_to_linear([0x55]).tolist() == [-8]      # negative min
        assert alaw_to_linear([0xD5]).tolist() == [8]       # positive min
        assert alaw_to_linear([0x2A]).tolist() == [-32256]  # negative max
        assert alaw_to_linear([0xAA]).tolist() == [32256]   # positive max

    def test_encode_decode_identity_on_codes(self):
        """encode(decode(code)) == code for every a-law code and every
        µ-law code except 0x7F: µ-law has two zero codes (0x7F/0xFF) and
        the midpoint quantizer deterministically picks 0xFF for 0."""
        import numpy as np

        from opps_feedcrawler_spark.functions.multimodal import (
            alaw_to_linear,
            linear_to_alaw,
            linear_to_ulaw,
            ulaw_to_linear,
        )

        codes = np.arange(256, dtype=np.uint8)
        rt_a = linear_to_alaw(alaw_to_linear(codes))
        assert (rt_a == codes).all()
        rt_u = linear_to_ulaw(ulaw_to_linear(codes))
        mismatch = codes[rt_u != codes].tolist()
        assert mismatch == [0x7F]
        assert linear_to_ulaw([0])[0] == 0xFF

    def test_quantizer_error_bounded_by_half_step(self):
        """decode(encode(x)) is within half the top-segment step of the
        clipped input — the defining property of midpoint quantization
        (µ-law top step 1024 -> 512; a-law top step 1024 -> 512)."""
        import numpy as np

        from opps_feedcrawler_spark.functions.multimodal import (
            alaw_to_linear,
            linear_to_alaw,
            linear_to_ulaw,
            ulaw_to_linear,
        )

        x = np.arange(-32768, 32768, 3, dtype=np.int64)
        du = ulaw_to_linear(linear_to_ulaw(x)).astype(np.int64)
        assert np.abs(du - np.clip(x, -32124, 32124)).max() <= 512
        da = alaw_to_linear(linear_to_alaw(x)).astype(np.int64)
        assert np.abs(da - np.clip(x, -32256, 32256)).max() <= 512

    def test_wav_dispatch_and_stereo_reshape(self):
        import numpy as np

        from opps_feedcrawler_spark.functions.multimodal import (
            alaw_to_linear,
            decode_wav_samples,
            parse_wav_meta,
            ulaw_to_linear,
        )

        payload = bytes(range(256))
        blob = encode_wav(8000, 2, payload, fmt_tag=7)
        meta = parse_wav_meta(blob)
        assert meta["fmt_tag"] == 7 and meta["bits"] == 8
        assert meta["n_frames"] == 128
        out = decode_wav_samples(blob)
        assert out.shape == (128, 2)
        ref = ulaw_to_linear(np.frombuffer(payload, np.uint8))
        assert (out.reshape(-1) == ref).all()
        out6 = decode_wav_samples(encode_wav(16000, 1, payload, fmt_tag=6))
        ref6 = alaw_to_linear(np.frombuffer(payload, np.uint8))
        assert (out6.reshape(-1) == ref6).all()

    def test_unsupported_tag_raises_not_implemented(self):
        from opps_feedcrawler_spark.functions.multimodal import (
            decode_wav_samples,
        )

        # hand-build a fmt tag 2 (ADPCM) header: parse succeeds (it is a
        # structural walk), decode refuses with the declared-stub error
        blob = (
            b"RIFF" + struct.pack("<I", 44) + b"WAVE"
            + b"fmt " + struct.pack("<I", 16)
            + struct.pack("<HHIIHH", 2, 1, 8000, 8000, 1, 8)
            + b"data" + struct.pack("<I", 8) + bytes(8)
        )
        assert parse_wav_meta(blob)["fmt_tag"] == 2
        with pytest.raises(NotImplementedError):
            decode_wav_samples(blob)

    def test_waveform_stats_over_g711(self, spark):
        """Stage-level: audio_waveform_stats over a µ-law blob reduces
        the EXPANDED amplitudes (not the code bytes)."""
        import numpy as np

        from opps_feedcrawler_spark.functions.multimodal import (
            audio_waveform_stats,
            ulaw_to_linear,
        )

        payload = bytes([0x00, 0x80, 0xFF, 0x7F, 0xFE, 0x7E])
        blob = encode_wav(8000, 1, payload, fmt_tag=7)
        df = spark.createDataFrame([("g", blob)], "url string, blob binary")
        (r,) = audio_waveform_stats(df).collect()
        vals = ulaw_to_linear(np.frombuffer(payload, np.uint8)).astype(np.int64)
        assert r.n_samples == 6
        assert r.sum_abs == int(np.abs(vals).sum()) == 64264
        assert r.peak == 32124
        assert r.dc_sum == int(vals.sum()) == 0


def test_truncated_fmt_chunk_raises_valueerror():
    """A fmt chunk whose declared length outruns the blob (torn download)
    must raise the contractual ValueError, not struct.error — the audio
    quarantine stage catches only ValueError (fuzz-found, round 4)."""
    from opps_feedcrawler_spark.functions.multimodal import (
        decode_wav_samples,
        encode_wav,
        parse_wav_meta,
    )

    blob = encode_wav(8000, 1, b"\x00" * 100, bits=16)[:28]  # cut inside fmt
    with pytest.raises(ValueError, match="truncated"):
        parse_wav_meta(blob)
    with pytest.raises(ValueError):
        decode_wav_samples(blob)


def test_zero_channel_fmt_raises_valueerror():
    """n_channels=0 in the fmt chunk must be rejected in parse (it drove
    a ZeroDivisionError in decode_wav_samples' frame-width arithmetic;
    fuzz-found, round 4)."""
    from opps_feedcrawler_spark.functions.multimodal import (
        decode_wav_samples,
        encode_wav,
        parse_wav_meta,
    )

    blob = bytearray(encode_wav(8000, 1, b"\x00" * 100, bits=16))
    blob[22:24] = struct.pack("<H", 0)  # fmt.n_channels
    with pytest.raises(ValueError, match="invalid"):
        parse_wav_meta(bytes(blob))
    with pytest.raises(ValueError):
        decode_wav_samples(bytes(blob))


def test_wav_mutation_sweep_only_contractual_errors():
    """Single-byte mutants and truncations of valid PCM and G.711 WAVs
    fail only with ValueError/NotImplementedError (or decode fine) —
    never struct.error / ZeroDivisionError / numpy shape errors."""
    import random

    from opps_feedcrawler_spark.functions.multimodal import (
        decode_wav_samples,
        encode_wav,
        parse_wav_meta,
    )

    rng = random.Random(4)
    bases = [
        encode_wav(8000, 2, bytes(rng.randrange(256) for _ in range(96)), bits=16),
        encode_wav(8000, 1, bytes(rng.randrange(256) for _ in range(64)), fmt_tag=7),
    ]
    for base in bases:
        for _ in range(400):
            mut = bytearray(base)
            mut[rng.randrange(len(mut))] = rng.randrange(256)
            for fn in (parse_wav_meta, decode_wav_samples):
                try:
                    fn(bytes(mut))
                except (ValueError, NotImplementedError):
                    pass
        for cut in range(len(base)):
            for fn in (parse_wav_meta, decode_wav_samples):
                try:
                    fn(base[:cut])
                except (ValueError, NotImplementedError):
                    pass
