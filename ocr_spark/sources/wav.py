"""Pure-stdlib WAV (RIFF/PCM) codec — the real audio path behind the
multimodal codec seam, the audio sibling of sources/png.py.

The training-data mandate treats audio as an opaque ``binary`` column
with typed metadata plus decode / feature-extract kernels.  WAV PCM is
the one audio container decodable with nothing beyond ``struct`` +
numpy (the sandbox has no soundfile/ffmpeg — the r3 codec probe — but
RIFF chunk walking and little-endian PCM are plain byte arithmetic), so
this closes the audio seam the way png.py closed the image seam: real
bytes in, real samples out, deterministic fakes only for formats that
genuinely need a native codec (mp3/ogg/aac).

Scope (raised-on otherwise): RIFF/WAVE with ``fmt `` audio format 1,
3 (float32), and the G.711 telephony pair 6 (A-law) / 7 (mu-law) —
format 1
(integer PCM) at 8/16/32-bit depth or 3 (float32), any channel count /
sample rate; ``data`` chunk required; other chunks (LIST, fact, cue)
skipped like PNG ancillary chunks.  Encoder writes canonical PCM16.

Execution shape: called only inside Arrow-batched kernels
(operators/multimodal.py) — decode rides the binary column where it
lives; nothing here touches the driver.
"""

from __future__ import annotations

import struct

import numpy as np


def is_wav(data: bytes) -> bool:
    """RIFF/WAVE signature sniff — the seam's dispatch test."""
    return (
        len(data) >= 12
        and data[:4] == b"RIFF"
        and data[8:12] == b"WAVE"
    )


def encode_wav(
    samples: np.ndarray, sample_rate: int = 16000
) -> bytes:
    """Samples → canonical PCM16 WAV bytes.  ``samples`` is int16
    (written verbatim) or float in [-1, 1] (scaled by 32767, rounded
    half away from zero — deterministic); shape (n,) mono or
    (n, channels)."""
    a = np.asarray(samples)
    if a.dtype != np.int16:
        a = np.clip(np.asarray(a, dtype=np.float64), -1.0, 1.0)
        a = np.where(
            a >= 0, np.floor(a * 32767 + 0.5), np.ceil(a * 32767 - 0.5)
        ).astype(np.int16)
    if a.ndim == 1:
        a = a[:, None]
    n, ch = a.shape
    if n == 0 or ch == 0:
        raise ValueError("empty audio")
    payload = a.astype("<i2").tobytes()  # interleaved frames
    byte_rate = sample_rate * ch * 2
    fmt = struct.pack(
        "<HHIIHH", 1, ch, sample_rate, byte_rate, ch * 2, 16
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(payload)) + payload
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def write_wav(path: str, samples: np.ndarray, **kw) -> None:
    """Fixture twin of write_png / write_tiff: a REAL file any audio
    tool can open."""
    with open(path, "wb") as f:
        f.write(encode_wav(samples, **kw))


def _g711_tables() -> tuple[np.ndarray, np.ndarray]:
    """G.711 expansion tables (ITU-T G.711): byte → int16 linear sample.
    Built arithmetically from the published formulas, not typed."""
    u = np.arange(256, dtype=np.int64) ^ 0xFF  # mu-law stores complemented
    sign = np.where(u & 0x80, -1, 1)
    exp = (u >> 4) & 0x07
    mant = u & 0x0F
    ulaw = sign * ((((mant << 3) + 0x84) << exp) - 0x84)
    a = np.arange(256, dtype=np.int64) ^ 0x55
    # A-law sign bit 1 = POSITIVE (opposite of mu-law's complemented form)
    sign_a = np.where(a & 0x80, 1, -1)
    exp_a = (a >> 4) & 0x07
    mant_a = a & 0x0F
    mag = np.where(
        exp_a == 0,
        (mant_a << 4) + 8,
        ((mant_a << 4) + 0x108) << np.maximum(exp_a - 1, 0),
    )
    alaw = sign_a * mag
    return (
        ulaw.astype(np.int16),
        alaw.astype(np.int16),
    )


_ULAW_TABLE, _ALAW_TABLE = _g711_tables()


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (int16 samples shaped (n, channels), sample_rate).
    8-bit PCM (unsigned) is centered then scaled ×256; 32-bit PCM is
    truncated to the high 16 bits; float32 is scaled like the encoder —
    all integer-deterministic.  Malformed input raises ValueError."""
    if not is_wav(data):
        raise ValueError("not a WAV: bad RIFF/WAVE signature")
    pos, n = 12, len(data)
    fmt = None
    payload = None
    while pos + 8 <= n:
        cid = data[pos : pos + 4]
        (ln,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + ln]
        if len(body) != ln:
            raise ValueError("truncated WAV chunk")
        if cid == b"fmt ":
            if ln < 16:
                raise ValueError("short fmt chunk")
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            payload = body
            # keep walking: fmt may legally follow? (it may not — fmt
            # precedes data per spec; break once both are seen)
            if fmt is not None:
                break
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned
    if fmt is None or payload is None:
        raise ValueError("WAV missing fmt or data chunk")
    audio_fmt, ch, rate, _brate, _align, bits = fmt
    if ch == 0:
        raise ValueError("zero channels")
    if audio_fmt == 1 and bits == 16:
        a = np.frombuffer(payload, dtype="<i2")
    elif audio_fmt == 1 and bits == 8:
        u = np.frombuffer(payload, dtype=np.uint8).astype(np.int64)
        a = ((u - 128) * 256).astype(np.int16)
    elif audio_fmt == 1 and bits == 32:
        a = (
            np.frombuffer(payload, dtype="<i4").astype(np.int64) >> 16
        ).astype(np.int16)
    elif audio_fmt == 6 and bits == 8:  # G.711 A-law (telephony)
        a = _ALAW_TABLE[np.frombuffer(payload, dtype=np.uint8)]
    elif audio_fmt == 7 and bits == 8:  # G.711 mu-law (telephony)
        a = _ULAW_TABLE[np.frombuffer(payload, dtype=np.uint8)]
    elif audio_fmt == 3 and bits == 32:
        f = np.clip(
            np.frombuffer(payload, dtype="<f4").astype(np.float64),
            -1.0, 1.0,
        )
        a = np.where(
            f >= 0, np.floor(f * 32767 + 0.5), np.ceil(f * 32767 - 0.5)
        ).astype(np.int16)
    else:
        raise ValueError(
            f"unsupported WAV format {audio_fmt}/{bits}-bit"
        )
    nfr = len(a) // ch
    return a[: nfr * ch].reshape(nfr, ch), rate


def frame_features(
    samples: np.ndarray, frame: int = 400
) -> np.ndarray:
    """Integer per-frame features of a mono int16 signal: for each full
    ``frame``-sample window, ``(sum_abs, zero_crossings, peak)`` as
    int64 — the energy/ZCR/peak triple a VAD or audio-quality filter
    keys on.  Pure integer (no float RMS), so the values are
    engine-portable for the driver oracle.  Shape (n_frames, 3)."""
    x = np.asarray(samples, dtype=np.int64)
    if x.ndim == 2:
        x = x[:, 0]
    nf = len(x) // frame
    if nf == 0:
        return np.zeros((0, 3), dtype=np.int64)
    w = x[: nf * frame].reshape(nf, frame)
    sum_abs = np.abs(w).sum(axis=1)
    sgn = w >= 0
    zc = (sgn[:, 1:] != sgn[:, :-1]).sum(axis=1).astype(np.int64)
    peak = np.abs(w).max(axis=1)
    return np.stack([sum_abs, zc, peak], axis=1)
