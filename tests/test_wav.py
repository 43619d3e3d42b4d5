"""Pure-stdlib WAV codec (sources/wav.py) + the real audio path behind
the multimodal seam: decode(encode(x)) == x for PCM16, depth
conversions, malformed-input behavior, integer frame features, and the
Spark kernel dispatch (real WAV vs deterministic fake)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from ocr_spark.sources.wav import (
    decode_wav,
    encode_wav,
    frame_features,
    is_wav,
    write_wav,
)

rng = np.random.default_rng(77)


def test_pcm16_roundtrip_mono_and_stereo():
    mono = rng.integers(-32768, 32768, 1000, dtype=np.int16)
    a, rate = decode_wav(encode_wav(mono, sample_rate=22050))
    assert rate == 22050 and a.shape == (1000, 1)
    assert (a[:, 0] == mono).all()
    st = rng.integers(-32768, 32768, (500, 2), dtype=np.int16)
    b, rate2 = decode_wav(encode_wav(st, sample_rate=8000))
    assert rate2 == 8000 and b.shape == (500, 2) and (b == st).all()


def test_float_input_scaling_deterministic():
    f = np.array([0.0, 1.0, -1.0, 0.5, -0.5, 2.0, -2.0])
    a, _ = decode_wav(encode_wav(f))
    assert list(a[:, 0]) == [0, 32767, -32767, 16384, -16384, 32767, -32767]


def test_8bit_and_32bit_and_float32_decode():
    # 8-bit unsigned PCM: 128 is silence
    payload8 = bytes([128, 255, 0, 129])
    fmt = struct.pack("<HHIIHH", 1, 1, 16000, 16000, 1, 8)
    wav8 = (
        b"RIFF" + struct.pack("<I", 4 + 24 + 8 + len(payload8)) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", len(payload8)) + payload8
    )
    a, _ = decode_wav(wav8)
    assert list(a[:, 0]) == [0, 127 * 256, -128 * 256, 256]
    # 32-bit PCM: high 16 bits kept
    s32 = np.array([1 << 16, -(1 << 16), (1 << 31) - 1], dtype="<i4")
    fmt32 = struct.pack("<HHIIHH", 1, 1, 16000, 64000, 4, 32)
    wav32 = (
        b"RIFF" + struct.pack("<I", 4 + 24 + 8 + 12) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + fmt32
        + b"data" + struct.pack("<I", 12) + s32.tobytes()
    )
    b, _ = decode_wav(wav32)
    assert list(b[:, 0]) == [1, -1, 32767]
    # float32
    f32 = np.array([0.5, -1.5], dtype="<f4")
    fmtf = struct.pack("<HHIIHH", 3, 1, 16000, 64000, 4, 32)
    wavf = (
        b"RIFF" + struct.pack("<I", 4 + 24 + 8 + 8) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + fmtf
        + b"data" + struct.pack("<I", 8) + f32.tobytes()
    )
    c, _ = decode_wav(wavf)
    assert list(c[:, 0]) == [16384, -32767]


def test_malformed_inputs_raise():
    good = encode_wav(np.zeros(10, dtype=np.int16))
    with pytest.raises(ValueError):
        decode_wav(b"not audio")
    with pytest.raises(ValueError):
        decode_wav(good[:20])  # truncated chunk
    with pytest.raises(ValueError):
        decode_wav(b"RIFF\x00\x00\x00\x00WAVE")  # no fmt/data
    # unsupported compression format code
    fmt = struct.pack("<HHIIHH", 85, 1, 16000, 16000, 1, 16)  # mp3-ish
    bad = (
        b"RIFF" + struct.pack("<I", 40) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", 2) + b"\x00\x00"
    )
    with pytest.raises(ValueError, match="unsupported"):
        decode_wav(bad)


def test_write_wav_fixture(tmp_path):
    s = rng.integers(-1000, 1000, 64, dtype=np.int16)
    p = str(tmp_path / "fx.wav")
    write_wav(p, s)
    a, _ = decode_wav(open(p, "rb").read())
    assert (a[:, 0] == s).all()
    assert is_wav(open(p, "rb").read())


def test_frame_features_integer_exact():
    s = np.array([3, -4, 0, -1, 5, 5, -5, 2], dtype=np.int16)
    ff = frame_features(s, frame=4)
    assert ff.shape == (2, 3)
    # frame 1: |3|+|-4|+|0|+|-1| = 8; signs + - + - → 3 crossings; peak 4
    assert list(ff[0]) == [8, 3, 4]
    # frame 2: 5+5+5+2 = 17; + + - + → 2 crossings; peak 5
    assert list(ff[1]) == [17, 2, 5]
    # trailing partial frame dropped
    assert frame_features(np.zeros(3, dtype=np.int16), frame=4).shape == (0, 3)


def test_audio_kernel_dispatch(spark):
    from ocr_spark.operators.multimodal import (
        extract_audio_features,
        synth_audio_for_refs,
    )

    refs = spark.createDataFrame(
        [("d1", "a.wav"), ("d2", "b.wav")], "doc_id string, media_ref string"
    )
    media = synth_audio_for_refs(refs, n_samples=1200)
    rows = {r["media_ref"]: r for r in extract_audio_features(media).collect()}
    for r in rows.values():
        # real decode path: the synth rate/shape, real integer features
        assert r["sample_rate"] == 16000 and r["n_channels"] == 1
        assert r["n_frames"] == 3  # 1200 samples / 400 frame
        assert r["sum_abs"] > 0 and r["peak"] <= 32768
    # determinism
    again = {
        r["media_ref"]: r for r in extract_audio_features(media).collect()
    }
    for k in rows:
        assert tuple(rows[k]) == tuple(again[k])
    # non-WAV bytes fall back to the deterministic fake, never raise
    fake = spark.createDataFrame(
        [("d3", "x.mp3", b"\xffID3 not wav", "audio/mpeg")],
        "doc_id string, media_ref string, content binary, mime string",
    )
    [fr] = extract_audio_features(fake).collect()
    assert fr["n_bytes"] == 12 and fr["sample_rate"] in range(8000, 18001)
