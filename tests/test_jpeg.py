"""Pure-Python baseline JPEG codec (sources/jpeg.py) + the real-pixel
dispatch behind the multimodal seam: exact roundtrips on the
DC-exact domain, pinned PSNR bounds on the lossy domain, hand-built
byte-level fixtures decoded against spec expectations (T.81 F.16),
decoder-only paths (4:2:0 subsampling, restart markers), degrade
behavior on fuzzed/unsupported streams, and the mixed PNG/JPEG
perceptual-hash re-lock."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from ocr_spark.sources.jpeg import (
    AC_LUMA_BITS,
    AC_LUMA_VALS,
    DC_LUMA_BITS,
    DC_LUMA_VALS,
    QUANT_CHROMA,
    QUANT_LUMA,
    ZIGZAG,
    decode_jpeg,
    encode_jpeg,
    is_jpeg,
    scaled_quant,
    ycbcr_to_rgb,
)

rng = np.random.default_rng(4321)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)


# ---------------------------------------------------------------------------
# tables
# ---------------------------------------------------------------------------


def test_zigzag_matches_spec_table():
    """The generated zigzag permutation equals T.81 Figure 5 verbatim."""
    spec = [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]
    assert list(ZIGZAG) == spec


def test_quality_scaling_libjpeg_formula():
    assert (scaled_quant(QUANT_LUMA, 50) == QUANT_LUMA).all()
    # q=100 → scale 0 → all-ones (clamped)
    assert (scaled_quant(QUANT_LUMA, 100) == 1).all()
    q25 = scaled_quant(QUANT_CHROMA, 25)
    assert (q25 >= QUANT_CHROMA).all() and q25.max() <= 255
    with pytest.raises(ValueError):
        scaled_quant(QUANT_LUMA, 0)


# ---------------------------------------------------------------------------
# roundtrips
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("shape", [(8, 8), (24, 40), (17, 31), (1, 1), (9, 64)])
def test_constant_gray_roundtrip_exact(shape):
    """A constant image quantizes to a DC-only multiple of Q[0,0] when
    8·(v−128) is — v=128 always is — so decode(encode(x)) == x exactly."""
    img = np.full(shape, 128, np.uint8)
    b = encode_jpeg(img)
    assert is_jpeg(b)
    dec = decode_jpeg(b)
    assert dec.shape == shape and (dec == img).all()


def test_blockwise_constant_roundtrip_exact():
    """Blockwise-constant values 128 + 16k (Q[0,0]=16 at quality 50)
    survive quantize→dequantize→IDCT bit-exactly — the DC-exact domain
    the jpeg_roundtrip driver oracle rides on."""
    vals = (128 + 16 * rng.integers(-4, 5, size=(5, 7))).astype(np.uint8)
    img = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1)
    dec = decode_jpeg(encode_jpeg(img))
    assert (dec == img).all()
    # also with non-multiple-of-8 crop (edge padding must not leak back)
    crop = img[:37, :51]
    dec = decode_jpeg(encode_jpeg(crop))
    assert dec.shape == crop.shape and (dec == crop).all()


def test_smooth_gray_psnr_pinned():
    x = np.linspace(0, 255, 64)
    img = np.clip(np.add.outer(x, x) / 2, 0, 255).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(img, quality=50))
    assert psnr(img, dec) > 40.0


def test_rgb_roundtrip_psnr_and_quality_monotone():
    base = rng.integers(0, 256, size=(33, 49, 3), dtype=np.uint8)
    smooth = np.clip(
        np.cumsum(np.cumsum(base.astype(np.float64), 0), 1) % 256, 0, 255
    ).astype(np.uint8)
    d50 = decode_jpeg(encode_jpeg(smooth, quality=50))
    d90 = decode_jpeg(encode_jpeg(smooth, quality=90))
    assert d50.shape == smooth.shape == d90.shape
    assert psnr(smooth, d90) > psnr(smooth, d50)
    assert psnr(smooth, d90) > 28.0


def test_noise_gray_shape_and_determinism():
    img = rng.integers(0, 256, size=(37, 53), dtype=np.uint8)
    b = encode_jpeg(img)
    assert encode_jpeg(img) == b  # deterministic encoder
    d1, d2 = decode_jpeg(b), decode_jpeg(b)
    assert d1.shape == img.shape and (d1 == d2).all()


# ---------------------------------------------------------------------------
# hand-built byte-level fixtures (independent of the encoder)
# ---------------------------------------------------------------------------


def _canon_codes(bits, vals):
    """Independent canonical Huffman assignment (T.81 C.2), re-derived in
    the test so fixture bitstreams don't trust the module's table."""
    codes, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            codes[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return codes


class _Bits:
    def __init__(self):
        self.s = ""

    def put(self, v, n):
        if n:
            self.s += format(v & ((1 << n) - 1), f"0{n}b")

    def bytes_(self):
        s = self.s + "1" * (-len(self.s) % 8)
        out = bytearray()
        for i in range(0, len(s), 8):
            byte = int(s[i : i + 8], 2)
            out.append(byte)
            if byte == 0xFF:
                out.append(0x00)
        return bytes(out)


def _dqt(tid, table):
    payload = bytes([tid]) + bytes(
        int(v) for v in np.asarray(table).reshape(64)[ZIGZAG]
    )
    return b"\xff\xdb" + struct.pack(">H", 2 + len(payload)) + payload


def _dht(cls, tid, bits, vals):
    payload = bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload


def _sof0(h, w, comps):
    seg = struct.pack(">BHHB", 8, h, w, len(comps))
    for cid, hv, tq in comps:
        seg += bytes([cid, hv, tq])
    return b"\xff\xc0" + struct.pack(">H", 2 + len(seg)) + seg


def _sos(comps):
    seg = bytes([len(comps)])
    for cid, tabs in comps:
        seg += bytes([cid, tabs])
    seg += bytes([0, 63, 0])
    return b"\xff\xda" + struct.pack(">H", 2 + len(seg)) + seg


def _put_dc_only(bits, dc_codes, ac_codes, diff):
    """Emit one block: DC category+bits, then EOB."""
    if diff == 0:
        s, extra = 0, 0
    else:
        s = abs(diff).bit_length()
        extra = diff if diff > 0 else diff + (1 << s) - 1
    c, ln = dc_codes[s]
    bits.put(c, ln)
    bits.put(extra, s)
    c, ln = ac_codes[0x00]
    bits.put(c, ln)


def test_handbuilt_single_block_decodes_exactly():
    """8×8 gray, one block, DC diff = +2, flat quant table of 16:
    dequantized DC = 32 → IDCT constant 32/8 = 4 → pixels 132, exactly
    (spec-traceable end to end, no encoder in the loop)."""
    dc = _canon_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac = _canon_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    flat16 = np.full((8, 8), 16, np.int64)
    bits = _Bits()
    _put_dc_only(bits, dc, ac, 2)
    stream = (
        b"\xff\xd8"
        + _dqt(0, flat16)
        + _sof0(8, 8, [(1, 0x11, 0)])
        + _dht(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
        + _dht(1, 0, AC_LUMA_BITS, AC_LUMA_VALS)
        + _sos([(1, 0x00)])
        + bits.bytes_()
        + b"\xff\xd9"
    )
    dec = decode_jpeg(stream)
    assert dec.shape == (8, 8)
    assert (dec == 132).all()


def test_handbuilt_restart_markers_reset_predictor():
    """16×8 gray, DRI=1: MCU0 (DC diff +2), RST0, MCU1 (DC diff +2 again
    after predictor reset) → both blocks decode to 132."""
    dc = _canon_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac = _canon_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    flat16 = np.full((8, 8), 16, np.int64)
    b0, b1 = _Bits(), _Bits()
    _put_dc_only(b0, dc, ac, 2)
    _put_dc_only(b1, dc, ac, 2)
    dri = b"\xff\xdd" + struct.pack(">HH", 4, 1)
    stream = (
        b"\xff\xd8"
        + _dqt(0, flat16)
        + dri
        + _sof0(8, 16, [(1, 0x11, 0)])
        + _dht(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
        + _dht(1, 0, AC_LUMA_BITS, AC_LUMA_VALS)
        + _sos([(1, 0x00)])
        + b0.bytes_()
        + b"\xff\xd0"
        + b1.bytes_()
        + b"\xff\xd9"
    )
    dec = decode_jpeg(stream)
    assert dec.shape == (8, 16)
    assert (dec == 132).all()


def test_handbuilt_420_subsampled_color():
    """16×16 YCbCr 4:2:0 (Y 2×2, Cb/Cr 1×1): four Y blocks + one of each
    chroma per MCU; constant planes decode to the BT.601-inverted
    constant color everywhere (upsample = ×2 repeat)."""
    dc = _canon_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac = _canon_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    flat16 = np.full((8, 8), 16, np.int64)
    bits = _Bits()
    for _diff in (2, 0, 0, 0):  # 4 Y blocks: predictor carries 32→ all DC=32
        _put_dc_only(bits, dc, ac, _diff)
    _put_dc_only(bits, dc, ac, 4)  # Cb DC = 64
    _put_dc_only(bits, dc, ac, -4)  # Cr DC = −64
    stream = (
        b"\xff\xd8"
        + _dqt(0, flat16)
        + _sof0(16, 16, [(1, 0x22, 0), (2, 0x11, 0), (3, 0x11, 0)])
        + _dht(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
        + _dht(1, 0, AC_LUMA_BITS, AC_LUMA_VALS)
        + _sos([(1, 0x00), (2, 0x00), (3, 0x00)])
        + bits.bytes_()
        + b"\xff\xd9"
    )
    dec = decode_jpeg(stream)
    assert dec.shape == (16, 16, 3)
    y, cb, cr = 132.0, 128.0 + 8.0, 128.0 - 8.0
    want = np.clip(
        np.rint(ycbcr_to_rgb(np.array([[[y, cb, cr]]]))), 0, 255
    ).astype(np.uint8)
    assert (dec == want.reshape(1, 1, 3)).all()


# ---------------------------------------------------------------------------
# unsupported / malformed behavior
# ---------------------------------------------------------------------------


def test_progressive_raises_clear_valueerror():
    b = bytearray(encode_jpeg(np.full((8, 8), 128, np.uint8)))
    i = b.find(b"\xff\xc0")
    b[i + 1] = 0xC2  # flip SOF0 → SOF2
    with pytest.raises(ValueError, match="progressive"):
        decode_jpeg(bytes(b))


def test_truncation_raises_valueerror_only():
    full = encode_jpeg(rng.integers(0, 256, (24, 24), dtype=np.uint8))
    for cut in range(2, len(full), 7):
        try:
            decode_jpeg(full[:cut])
        except ValueError:
            pass  # the only acceptable failure type


def test_bitflip_fuzz_valueerror_only_and_sniff_never_raises():
    from ocr_spark.sources.imagecodec import sniff_decode

    full = bytearray(encode_jpeg(rng.integers(0, 256, (24, 24), dtype=np.uint8)))
    for i in range(0, len(full), 5):
        fuzz = bytearray(full)
        fuzz[i] ^= 0xFF
        data = bytes(fuzz)
        try:
            decode_jpeg(data)
        except ValueError:
            pass
        out = sniff_decode(data)  # must never raise
        assert out is None or isinstance(out, np.ndarray)


def test_not_a_jpeg():
    assert not is_jpeg(b"")
    assert not is_jpeg(b"\x89PNG\r\n\x1a\nrest")
    with pytest.raises(ValueError):
        decode_jpeg(b"plainly not a jpeg")


# ---------------------------------------------------------------------------
# dispatch integration: the multimodal/raster seams on real JPEG pixels
# ---------------------------------------------------------------------------


def test_sniff_decode_routes_both_codecs():
    from ocr_spark.sources.imagecodec import decode_image, sniff_decode
    from ocr_spark.sources.png import encode_png

    img = np.repeat(
        np.repeat((128 + 16 * rng.integers(-3, 4, (4, 6))).astype(np.uint8), 8, 0),
        8, 1,
    )
    for blob in (encode_png(img), encode_jpeg(img)):
        assert (sniff_decode(blob) == img).all()
        assert (decode_image(blob) == img).all()
    assert sniff_decode(b"neither format") is None


def test_mixed_format_ahash_relock():
    """The media-dedup catch byte digests can never make, now across
    FORMATS: a PNG and a JPEG of the same image share no bytes yet must
    carry identical perceptual hashes (exact on the DC-exact domain)."""
    from ocr_spark.operators.multimodal import _grid, average_hash_bits
    from ocr_spark.sources.png import encode_png

    vals = (128 + 16 * rng.integers(-4, 5, (5, 7))).astype(np.uint8)
    img = np.repeat(np.repeat(vals, 8, 0), 8, 1)
    variants = [
        encode_png(img, filters=0),
        encode_png(img, filters=4),
        encode_jpeg(img),
        encode_jpeg(img, quality=95),
    ]
    assert len(set(variants)) == 4  # four genuinely different byte blobs
    hashes = {average_hash_bits(_grid(v)) for v in variants}
    assert len(hashes) == 1
    other = np.repeat(
        np.repeat((128 + 16 * rng.integers(-4, 5, (5, 7))).astype(np.uint8), 8, 0),
        8, 1,
    )
    assert average_hash_bits(_grid(encode_jpeg(other))) not in hashes


def test_media_neardup_mixed_format_classes(spark):
    """hamming_neardup groups PNG- and JPEG-encoded members of the same
    visual class together — the end-to-end mixed-codec re-lock."""
    from pyspark.sql import functions as F

    from ocr_spark.operators.dedup import hamming_neardup
    from ocr_spark.operators.multimodal import media_avg_hash
    from ocr_spark.sources.png import encode_png

    rows = []
    for cls in range(3):
        vals = (128 + 16 * rng.integers(-4, 5, (6, 8))).astype(np.uint8)
        img = np.repeat(np.repeat(vals, 8, 0), 8, 1)
        rows.append((f"c{cls}", f"c{cls}/a.png", encode_png(img, filters=2), "image/png"))
        rows.append((f"c{cls}", f"c{cls}/b.jpg", encode_jpeg(img), "image/jpeg"))
    media = spark.createDataFrame(
        rows, "doc_id string, media_ref string, content binary, mime string"
    )
    hashed = media_avg_hash(media)
    pairs = hamming_neardup(
        hashed.select(F.col("media_ref").alias("item"), "ahash"),
        hash_col="ahash",
        id_col="item",
        bits=64,
        max_hamming=3,
    ).collect()
    got = {tuple(sorted((r["a"], r["b"]))) for r in pairs}
    want = {
        tuple(sorted((f"c{c}/a.png", f"c{c}/b.jpg"))) for c in range(3)
    }
    assert got == want


def test_resize_media_jpeg_stays_jpeg(spark):
    """resize_media keeps the container format (reference keeps the
    original extension): JPEG in → smaller real JPEG out, PNG in → PNG."""
    from ocr_spark.operators.multimodal import resize_media
    from ocr_spark.sources.png import encode_png, is_png

    img = np.repeat(
        np.repeat((128 + 16 * rng.integers(-3, 4, (8, 12))).astype(np.uint8), 8, 0),
        8, 1,
    )
    media = spark.createDataFrame(
        [
            ("d1", "a.jpg", encode_jpeg(img), "image/jpeg"),
            ("d1", "a.png", encode_png(img), "image/png"),
        ],
        "doc_id string, media_ref string, content binary, mime string",
    )
    out = {
        r["media_ref"]: r
        for r in resize_media(media, max_px=48).collect()
    }
    jr, pr = out["a.jpg"], out["a.png"]
    assert (jr["width"], jr["height"]) == (96, 64)
    assert (jr["out_width"], jr["out_height"]) == (48, 32)
    assert is_jpeg(bytes(jr["content"]))
    dec = decode_jpeg(bytes(jr["content"]))
    assert dec.shape == (32, 48)
    assert is_png(bytes(pr["content"]))


def test_raster_pages_decode_jpeg(spark):
    """decode_png_pages (the G-chain entry) accepts JPEG page bytes: on
    the DC-exact domain the decoded grayscale equals the direct-path
    bitmap, so segmentation is identical; corrupt rows still degrade."""
    from ocr_spark.operators.raster import decode_png_pages

    vals = (128 + 16 * rng.integers(-4, 5, (6, 9))).astype(np.uint8)
    img = np.repeat(np.repeat(vals, 8, 0), 8, 1)
    pages = spark.createDataFrame(
        [
            ("d1", 1, bytearray(encode_jpeg(img))),
            ("d1", 2, bytearray(b"not an image")),
        ],
        "doc_id string, page_no int, content binary",
    )
    got = {r["page_no"]: r for r in decode_png_pages(pages).collect()}
    assert (got[1]["width"], got[1]["height"]) == (72, 48)
    dec = np.frombuffer(bytes(got[1]["bitmap"]), np.uint8).reshape(48, 72)
    assert (dec == img).all()
    assert (got[2]["width"], got[2]["height"]) == (0, 0)


# ---------------------------------------------------------------------------
# progressive (SOF2) decode — r5
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("shape", [(8, 8), (24, 40), (17, 31), (37, 53)])
def test_progressive_decode_equals_baseline_gray(shape):
    """Spectral-selection progressive streams carry the same quantized
    coefficients as baseline, so decode must be bit-identical."""
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    base = decode_jpeg(encode_jpeg(img))
    prog = decode_jpeg(encode_jpeg(img, progressive=True))
    assert prog.shape == base.shape and (prog == base).all()


def test_progressive_decode_equals_baseline_rgb_and_dc_exact():
    img = rng.integers(0, 256, (33, 49, 3), dtype=np.uint8)
    assert (
        decode_jpeg(encode_jpeg(img, progressive=True))
        == decode_jpeg(encode_jpeg(img))
    ).all()
    vals = (128 + 16 * rng.integers(-4, 5, (5, 7))).astype(np.uint8)
    exact = np.repeat(np.repeat(vals, 8, 0), 8, 1)
    assert (decode_jpeg(encode_jpeg(exact, progressive=True)) == exact).all()


def _sos_seg(comps, ss, se, ah, al):
    seg = bytes([len(comps)])
    for cid, tabs in comps:
        seg += bytes([cid, tabs])
    seg += bytes([ss, se, (ah << 4) | al])
    return b"\xff\xda" + struct.pack(">H", 2 + len(seg)) + seg


def test_handbuilt_successive_approximation_scans():
    """Four hand-built scans (DC first Al=1, DC refine, AC first Al=1,
    AC refine) must reconstruct exactly the coefficients {DC=2, AC1=3,
    AC5=-1}; cross-checked against a hand-built BASELINE stream carrying
    the same coefficients — two entropy paths, one answer."""
    dc = _canon_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac = _canon_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    flat16 = np.full((8, 8), 16, np.int64)
    head = (
        b"\xff\xd8" + _dqt(0, flat16)
        + b"\xff\xc2" + struct.pack(">H", 11)
        + struct.pack(">BHHB", 8, 8, 8, 1) + b"\x01\x11\x00"
        + _dht(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
        + _dht(1, 0, AC_LUMA_BITS, AC_LUMA_VALS)
    )
    # scan 1: DC first, Al=1 → codes DC>>1 = 1
    b1 = _Bits()
    c, ln = dc[1]; b1.put(c, ln); b1.put(1, 1)
    # scan 2: DC refinement, Al=0 → appends bit DC&1 = 0
    b2 = _Bits(); b2.put(0, 1)
    # scan 3: AC first, Al=1 → AC1 = 3>>1 = 1 (AC5 = -1 truncates to 0)
    b3 = _Bits()
    c, ln = ac[0x01]; b3.put(c, ln); b3.put(1, 1)  # (run 0, size 1) value 1
    c, ln = ac[0x00]; b3.put(c, ln)  # EOB
    # scan 4: AC refinement, Al=0: correction bit 1 for AC1 (3&1), then
    # a new -1 at AC5 (3 zero-history skips, sign bit 0), then EOB
    b4 = _Bits()
    c, ln = ac[0x31]; b4.put(c, ln)  # r=3, s=1
    b4.put(0, 1)  # sign: negative
    b4.put(1, 1)  # correction bit for AC1 (the one nonzero passed)
    c, ln = ac[0x00]; b4.put(c, ln)  # EOB → correction bits (none left)
    stream = (
        head
        + _sos_seg([(1, 0x00)], 0, 0, 0, 1) + b1.bytes_()
        + _sos_seg([(1, 0x00)], 0, 0, 1, 0) + b2.bytes_()
        + _sos_seg([(1, 0x00)], 1, 63, 0, 1) + b3.bytes_()
        + _sos_seg([(1, 0x00)], 1, 63, 1, 0) + b4.bytes_()
        + b"\xff\xd9"
    )
    got = decode_jpeg(stream)
    # baseline twin with the same coefficients: DC diff 2, AC1=3, AC5=-1
    bb = _Bits()
    c, ln = dc[2]; bb.put(c, ln); bb.put(2, 2)
    c, ln = ac[0x02]; bb.put(c, ln); bb.put(3, 2)  # (0,2) value 3 at k=1
    c, ln = ac[0x31]; bb.put(c, ln); bb.put(0, 1)  # (3,1) value -1 at k=5
    c, ln = ac[0x00]; bb.put(c, ln)
    base_stream = (
        b"\xff\xd8" + _dqt(0, flat16)
        + _sof0(8, 8, [(1, 0x11, 0)])
        + _dht(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
        + _dht(1, 0, AC_LUMA_BITS, AC_LUMA_VALS)
        + _sos([(1, 0x00)])
        + bb.bytes_()
        + b"\xff\xd9"
    )
    want = decode_jpeg(base_stream)
    assert got.shape == (8, 8)
    assert (got == want).all()


def test_handbuilt_eob_run_spans_blocks():
    """EOB1 with appended bit 0 covers the current block AND the next:
    a 16-wide two-block scan where block 2 is never coded decodes block
    2's AC band to zero."""
    dc = _canon_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    # EOBn symbols (r<<4, s=0 for r>0) are NOT in the baseline Annex K
    # AC table — progressive streams carry custom DHTs; this fixture's
    # table holds exactly the three symbols the scan needs, 2 bits each
    ac_bits = [0, 3] + [0] * 14
    ac_vals = [0x03, 0x10, 0x00]
    ac = _canon_codes(ac_bits, ac_vals)
    flat16 = np.full((8, 8), 16, np.int64)
    head = (
        b"\xff\xd8" + _dqt(0, flat16)
        + b"\xff\xc2" + struct.pack(">H", 11)
        + struct.pack(">BHHB", 8, 8, 16, 1) + b"\x01\x11\x00"
        + _dht(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
        + _dht(1, 0, ac_bits, ac_vals)
    )
    # DC scan: both blocks DC diff +2 then 0 (predictor holds 2)
    b1 = _Bits()
    c, ln = dc[2]; b1.put(c, ln); b1.put(2, 2)
    c, ln = dc[0]; b1.put(c, ln)
    # AC scan: block 1 has AC1=5, then EOB1 (covers block 2 entirely)
    b2 = _Bits()
    c, ln = ac[0x03]; b2.put(c, ln); b2.put(5, 3)  # (0,3) value 5
    c, ln = ac[0x10]; b2.put(c, ln); b2.put(0, 1)  # EOB1, appended bit 0
    stream = (
        head
        + _sos_seg([(1, 0x00)], 0, 0, 0, 0) + b1.bytes_()
        + _sos_seg([(1, 0x00)], 1, 63, 0, 0) + b2.bytes_()
        + b"\xff\xd9"
    )
    got = decode_jpeg(stream)
    assert got.shape == (8, 16)
    # block 2 must be the flat DC-only reconstruction: 2*16/8 + 128 = 132
    assert (got[:, 8:] == 132).all()
    # block 1 carries the AC ripple — not flat
    assert got[:, :8].min() != got[:, :8].max()


def test_progressive_fuzz_valueerror_only():
    from ocr_spark.sources.imagecodec import sniff_decode

    full = bytearray(
        encode_jpeg(
            rng.integers(0, 256, (24, 24), dtype=np.uint8), progressive=True
        )
    )
    for i in range(0, len(full), 7):
        fuzz = bytearray(full)
        fuzz[i] ^= 0x5A
        data = bytes(fuzz)
        try:
            decode_jpeg(data)
        except ValueError:
            pass
        out = sniff_decode(data)
        assert out is None or isinstance(out, np.ndarray)
