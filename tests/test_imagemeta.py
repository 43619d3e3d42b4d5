"""Header-only image metadata (sources/imagemeta.py): real dimensions
for JPEG/GIF/BMP/WebP from hand-built headers, the sniff dispatch's
degrade contract, and the kernel integration (real dims without pixel
decode)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from ocr_spark.sources.imagemeta import (
    bmp_size,
    gif_size,
    jpeg_size,
    sniff_dimensions,
    webp_size,
)


def _jpeg(w, h, progressive=False, exif_pad=True):
    """Minimal structurally-valid JPEG prefix: SOI, APP1 (skipped by
    length), optional fill bytes, then SOF0/SOF2."""
    out = [b"\xff\xd8"]
    if exif_pad:
        payload = b"Exif\x00\x00" + b"\x00" * 10
        out.append(b"\xff\xe1" + struct.pack(">H", 2 + len(payload)) + payload)
    out.append(b"\xff\xff")  # fill byte before marker (legal)
    sof = b"\xff\xc2" if progressive else b"\xff\xc0"
    body = struct.pack(">BHHB", 8, h, w, 3)
    out.append(sof + struct.pack(">H", 2 + len(body)) + body)
    return b"".join(out)


def test_jpeg_baseline_and_progressive():
    assert jpeg_size(_jpeg(640, 480)) == (640, 480)
    assert jpeg_size(_jpeg(31, 7, progressive=True)) == (31, 7)
    assert sniff_dimensions(_jpeg(100, 50)) == ("jpeg", 100, 50)


def test_jpeg_malformed():
    with pytest.raises(ValueError):
        jpeg_size(b"\xff\xd8\xff\xda\x00\x02")  # SOS before SOF
    with pytest.raises(ValueError):
        jpeg_size(b"nope")
    with pytest.raises(ValueError):
        jpeg_size(_jpeg(10, 10)[:-3])  # truncated SOF


def test_gif_bmp_webp():
    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00" * 4
    assert gif_size(gif) == (320, 200)
    assert sniff_dimensions(gif) == ("gif", 320, 200)

    bmp = (
        b"BM" + b"\x00" * 12 + struct.pack("<I", 40)
        + struct.pack("<ii", 800, -600) + b"\x00" * 20
    )
    assert bmp_size(bmp) == (800, 600)  # top-down height reported positive
    assert sniff_dimensions(bmp) == ("bmp", 800, 600)

    core = (
        b"BM" + b"\x00" * 12 + struct.pack("<I", 12)
        + struct.pack("<HH", 64, 48) + b"\x00" * 8
    )
    assert bmp_size(core) == (64, 48)

    vp8l_bits = (257 - 1) | ((129 - 1) << 14)
    webp_l = (
        b"RIFF" + struct.pack("<I", 30) + b"WEBP"
        + b"VP8L" + struct.pack("<I", 10) + b"\x2f"
        + vp8l_bits.to_bytes(4, "little") + b"\x00" * 6
    )
    assert webp_size(webp_l) == (257, 129)
    assert sniff_dimensions(webp_l) == ("webp", 257, 129)

    webp_x = (
        b"RIFF" + struct.pack("<I", 30) + b"WEBP"
        + b"VP8X" + struct.pack("<I", 10) + b"\x00" * 4
        + (1023).to_bytes(3, "little") + (511).to_bytes(3, "little")
        + b"\x00" * 4
    )
    assert webp_size(webp_x) == (1024, 512)

    webp_v = (
        b"RIFF" + struct.pack("<I", 30) + b"WEBP"
        + b"VP8 " + struct.pack("<I", 12) + b"\x00\x00\x00"
        + b"\x9d\x01\x2a" + struct.pack("<HH", 176, 144) + b"\x00" * 4
    )
    assert webp_size(webp_v) == (176, 144)


def test_sniff_degrades_to_none():
    assert sniff_dimensions(b"") is None
    assert sniff_dimensions(b"garbage bytes here") is None
    assert sniff_dimensions(b"\xff\xd8broken") is None  # corrupt jpeg
    assert sniff_dimensions(b"BM" + b"\x00" * 5) is None  # truncated bmp


def test_kernel_reports_real_header_dims(spark):
    """extract_media_features on a JPEG/GIF: REAL dimensions from the
    header, fake pixel feature — the documented split."""
    from ocr_spark.operators.multimodal import extract_media_features

    rows = [
        ("d1", "a.jpg", bytearray(_jpeg(640, 480)), "image/jpeg"),
        (
            "d1", "b.gif",
            bytearray(b"GIF87a" + struct.pack("<HH", 99, 77) + b"\x00" * 4),
            "image/gif",
        ),
    ]
    media = spark.createDataFrame(
        rows, "doc_id string, media_ref string, content binary, mime string"
    )
    got = {r["media_ref"]: r for r in extract_media_features(media).collect()}
    assert (got["a.jpg"]["width"], got["a.jpg"]["height"]) == (640, 480)
    assert (got["b.gif"]["width"], got["b.gif"]["height"]) == (99, 77)
    assert len(got["a.jpg"]["feat"]) == 8  # fake descriptor, well-formed


def test_ahash_robust_to_box_downsample():
    """Perceptual sanity on the real pixel path: aHash of an image and
    of its 2× box-downsampled PNG differ by only a few bits (exact
    box means make the 8×8 grids nearly identical)."""
    from ocr_spark.operators.multimodal import _grid, average_hash_bits
    from ocr_spark.sources.png import box_resample, encode_png

    rng = np.random.default_rng(5)
    base = rng.integers(0, 256, (64, 64), dtype=np.uint8)
    # smooth it so downsampling is information-preserving at 8x8
    smooth = box_resample(base, 16, 16).repeat(4, axis=0).repeat(4, axis=1)
    h1 = average_hash_bits(_grid(encode_png(smooth)))
    small = box_resample(smooth, 32, 32)
    h2 = average_hash_bits(_grid(encode_png(small)))
    ham = bin((h1 ^ h2) & (2**64 - 1)).count("1")
    assert ham <= 4, ham
