"""GIF (sources/gif.py: real LZW, palettes, interlace), BMP
(sources/bmp.py: BI_RGB 8/24/32-bit, both row orders) and G.711
telephony WAV (sources/wav.py formats 6/7) — the r5 codec set that
closes the GIF/BMP pixel seam, plus dispatch/degrade and the
cross-format perceptual-hash property."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from ocr_spark.sources.bmp import decode_bmp, encode_bmp, is_bmp
from ocr_spark.sources.gif import (
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    encode_gif,
    is_gif,
)
from ocr_spark.sources.imagecodec import sniff_decode

rng = np.random.default_rng(112233)


# ---------------------------------------------------------------------------
# GIF
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("n", [1, 2, 254, 255, 256, 511, 512, 5000])
def test_lzw_width_bump_boundaries(n):
    """The classic GIF off-by-one: width bumps track codes READ (the
    encoder assigns a slot for its first emission; the decoder cannot),
    pinned at every 2^k boundary."""
    data = rng.integers(0, 256, n).tolist()
    out = _lzw_decode(8, bytes(_lzw_encode(8, data)), n)
    assert list(out) == data


def test_lzw_small_alphabet_clears_and_kwkwk():
    """min_code=2 over a long stream fills the 4096-entry table many
    times (CLEAR/reset path) and hits KwKwK expansions."""
    data = rng.integers(0, 4, 50_000).tolist()
    out = _lzw_decode(2, bytes(_lzw_encode(2, data)), len(data))
    assert list(out) == data
    # canonical KwKwK sequence: ababab... emits a just-inserted code
    seq = [0, 1] * 200
    out = _lzw_decode(2, bytes(_lzw_encode(2, seq)), len(seq))
    assert list(out) == seq


@pytest.mark.parametrize("interlace", [False, True])
def test_gif_roundtrip(interlace):
    img = rng.integers(0, 256, (45, 61), dtype=np.uint8)
    b = encode_gif(img, interlace=interlace)
    assert is_gif(b)
    dec = decode_gif(b)
    assert (dec == np.stack([img] * 3, -1)).all()


def test_gif_rgb_palette_roundtrip():
    small = rng.integers(0, 5, (19, 23), dtype=np.uint8) * 50
    img = np.stack([small, 255 - small, small // 3], -1).astype(np.uint8)
    assert (decode_gif(encode_gif(img)) == img).all()
    with pytest.raises(ValueError, match="256 distinct"):
        encode_gif(rng.integers(0, 256, (40, 40, 3), dtype=np.uint8))


def test_gif_extension_blocks_skipped():
    """GCE/comment extensions before the image descriptor are walked
    over by their sub-block lengths."""
    img = rng.integers(0, 256, (8, 9), dtype=np.uint8)
    b = bytearray(encode_gif(img))
    # splice a graphic-control extension after the GCT (13 + 256*3 bytes)
    at = 13 + 256 * 3
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    com = b"\x21\xfe\x05hello\x00"
    patched = bytes(b[:at]) + gce + com + bytes(b[at:])
    assert (decode_gif(patched) == np.stack([img] * 3, -1)).all()


def test_gif_subframe_composites_onto_screen():
    """A frame smaller than the logical screen lands at (left, top) on a
    background of palette entry 0."""
    img = rng.integers(1, 256, (4, 5), dtype=np.uint8)
    b = bytearray(encode_gif(img))
    # widen the logical screen to 10x8 and move the frame to (3, 2)
    b[6:10] = struct.pack("<HH", 10, 8)
    at = 13 + 256 * 3  # image descriptor offset
    assert b[at] == 0x2C
    b[at + 1 : at + 5] = struct.pack("<HH", 3, 2)
    dec = decode_gif(bytes(b))
    assert dec.shape == (8, 10, 3)
    assert (dec[2:6, 3:8, 0] == img).all()
    assert (dec[0, 0] == [0, 0, 0]).all()  # palette entry 0 background


# ---------------------------------------------------------------------------
# BMP
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("top_down", [False, True])
def test_bmp_rgb_roundtrip(top_down):
    img = rng.integers(0, 256, (13, 17, 3), dtype=np.uint8)
    b = encode_bmp(img, top_down=top_down)
    assert is_bmp(b)
    assert (decode_bmp(b) == img).all()


def test_bmp_palette_and_32bit():
    gray = rng.integers(0, 256, (9, 7), dtype=np.uint8)
    dec = decode_bmp(encode_bmp(gray))
    assert (dec == np.stack([gray] * 3, -1)).all()
    # hand-build a 32-bit BGRA file: alpha must be dropped
    img = rng.integers(0, 256, (3, 2, 3), dtype=np.uint8)
    h, w = img.shape[:2]
    rows = np.zeros((h, w, 4), np.uint8)
    rows[:, :, :3] = img[:, :, [2, 1, 0]]
    rows[:, :, 3] = 0xAB
    info = struct.pack("<IiiHHIIiiII", 40, w, -h, 1, 32, 0, 0, 0, 0, 0, 0)
    data = (
        b"BM" + struct.pack("<IHHI", 0, 0, 0, 54) + info + rows.tobytes()
    )
    assert (decode_bmp(data) == img).all()


def test_bmp_unsupported_degrades():
    img = rng.integers(0, 256, (6, 6, 3), dtype=np.uint8)
    b = bytearray(encode_bmp(img))
    b[30] = 1  # BI_RLE8 compression
    with pytest.raises(ValueError, match="compression"):
        decode_bmp(bytes(b))
    assert sniff_decode(bytes(b)) is None


# ---------------------------------------------------------------------------
# dispatch + cross-format property
# ---------------------------------------------------------------------------


def test_four_format_ahash_agreement():
    """The same image written as PNG, GIF and BMP (lossless all three)
    must produce the SAME aHash — and a lossy JPEG of it on the DC-exact
    domain too.  Four containers, zero shared bytes, one hash."""
    from ocr_spark.operators.multimodal import _grid, average_hash_bits
    from ocr_spark.sources.jpeg import encode_jpeg
    from ocr_spark.sources.png import encode_png

    vals = (128 + 16 * rng.integers(-4, 5, (5, 8))).astype(np.uint8)
    img = np.repeat(np.repeat(vals, 8, 0), 8, 1)
    blobs = [
        encode_png(img),
        encode_gif(img),
        encode_bmp(np.stack([img] * 3, -1)),
        encode_jpeg(img),
    ]
    assert len({b[:4] for b in blobs}) == 4  # four different containers
    hashes = {average_hash_bits(_grid(b)) for b in blobs}
    assert len(hashes) == 1


def test_gif_bmp_fuzz_through_sniff():
    img = rng.integers(0, 256, (16, 20), dtype=np.uint8)
    for base in (encode_gif(img), encode_bmp(np.stack([img] * 3, -1))):
        for i in range(0, len(base), 17):
            fuzz = bytearray(base)
            fuzz[i] ^= 0xFF
            out = sniff_decode(bytes(fuzz))  # must never raise
            assert out is None or isinstance(out, np.ndarray)
        for cut in range(0, len(base), 23):
            out = sniff_decode(base[:cut])
            assert out is None or isinstance(out, np.ndarray)


# ---------------------------------------------------------------------------
# G.711 WAV
# ---------------------------------------------------------------------------


def _wav(fmt, ch, rate, bits, payload):
    blk = max(1, ch * bits // 8)
    f = struct.pack("<HHIIHH", fmt, ch, rate, rate * blk, blk, bits)
    body = (
        b"fmt " + struct.pack("<I", len(f)) + f
        + b"data" + struct.pack("<I", len(payload)) + payload
    )
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def test_g711_tables_standard_anchors():
    from ocr_spark.sources.wav import _ALAW_TABLE, _ULAW_TABLE

    # published table anchors (ITU-T G.711)
    assert _ULAW_TABLE[0x00] == -32124 and _ULAW_TABLE[0x80] == 32124
    assert _ULAW_TABLE[0xFF] == 0 and _ULAW_TABLE[0x7F] == 0
    assert _ALAW_TABLE[0xD5] == 8 and _ALAW_TABLE[0x55] == -8
    # segment-7 extremes: A-law tops out at ±32256 (4032 × 8)
    assert _ALAW_TABLE[0xAA] == 32256 and _ALAW_TABLE[0x2A] == -32256
    enc = np.arange(256)
    # sign-bit flip negates, both laws
    assert (_ALAW_TABLE[enc] == -_ALAW_TABLE[enc ^ 0x80]).all()
    assert (_ULAW_TABLE[enc] == -_ULAW_TABLE[enc ^ 0x80]).all()


def test_g711_wav_decode_and_kernel(spark):
    from ocr_spark.operators.multimodal import extract_audio_features
    from ocr_spark.sources.wav import _ULAW_TABLE, decode_wav

    raw = bytes(range(256)) * 25  # 6400 samples = 16 exact 400-frames
    a, rate = decode_wav(_wav(7, 1, 8000, 8, raw))
    assert a.shape == (6400, 1) and rate == 8000
    assert (a[:256, 0] == _ULAW_TABLE).all()
    media = spark.createDataFrame(
        [
            ("d1", "call.wav", bytearray(_wav(7, 1, 8000, 8, raw)), "audio/wav"),
            ("d1", "alaw.wav", bytearray(_wav(6, 1, 8000, 8, raw)), "audio/wav"),
        ],
        "doc_id string, media_ref string, content binary, mime string",
    )
    rows = {r["media_ref"]: r for r in extract_audio_features(media).collect()}
    assert rows["call.wav"]["sample_rate"] == 8000
    assert rows["call.wav"]["n_channels"] == 1
    # real decode: sum_abs equals the table rollup, not the digest fake
    # (the kernel sums complete frames only; 6400 is frame-aligned)
    want = int(np.abs(np.tile(_ULAW_TABLE, 25).astype(np.int64)).sum())
    assert rows["call.wav"]["sum_abs"] == want


def test_resize_media_bmp_stays_bmp(spark):
    """resize_media keeps the container format for BMP too (r5): real
    decode → box-resample → re-encode BMP; GIF input falls back to PNG
    (resampled frames generally exceed 256 colors)."""
    from ocr_spark.operators.multimodal import resize_media
    from ocr_spark.sources.png import is_png

    img = rng.integers(0, 256, (64, 96, 3), dtype=np.uint8)
    gray = rng.integers(0, 256, (64, 96), dtype=np.uint8)
    media = spark.createDataFrame(
        [
            ("d1", "a.bmp", bytearray(encode_bmp(img)), "image/bmp"),
            ("d1", "a.gif", bytearray(encode_gif(gray)), "image/gif"),
        ],
        "doc_id string, media_ref string, content binary, mime string",
    )
    out = {r["media_ref"]: r for r in resize_media(media, max_px=48).collect()}
    br = out["a.bmp"]
    assert (br["out_width"], br["out_height"]) == (48, 32)
    assert is_bmp(bytes(br["content"]))
    assert decode_bmp(bytes(br["content"])).shape == (32, 48, 3)
    gr = out["a.gif"]
    assert (gr["width"], gr["height"]) == (96, 64)  # real GIF geometry
    assert is_png(bytes(gr["content"]))  # documented PNG fallback
