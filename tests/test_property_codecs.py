"""Property-based round-trips for the pure-Python codecs: arbitrary
pixel arrays through PNG encode/decode and arbitrary sample arrays
through WAV encode/decode must come back bit-identical, for every
filter strategy / shape / channel count hypothesis throws at them.

Runs on the codecs directly (no Spark session) so hypothesis can afford
many examples — the test_property_hocr.py pattern."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from ocr_spark.sources.png import box_resample, decode_png, encode_png
from ocr_spark.sources.wav import decode_wav, encode_wav, frame_features


@st.composite
def images(draw):
    h = draw(st.integers(1, 24))
    w = draw(st.integers(1, 24))
    ch = draw(st.sampled_from([1, 2, 3, 4]))
    seed = draw(st.integers(0, 2**32 - 1))
    rng = np.random.default_rng(seed)
    shape = (h, w) if ch == 1 else (h, w, ch)
    return rng.integers(0, 256, size=shape, dtype=np.uint8)


@given(
    img=images(),
    filt=st.one_of(st.integers(0, 4), st.just("auto")),
    level=st.integers(0, 9),
)
@settings(max_examples=120, deadline=None)
def test_png_roundtrip_property(img, filt, level):
    b = encode_png(img, filters=filt, compress_level=level)
    out = decode_png(b)
    assert out.shape == img.shape and (out == img).all()


@given(img=images(), seed=st.integers(0, 2**16))
@settings(max_examples=60, deadline=None)
def test_png_per_row_filters_property(img, seed):
    rng = np.random.default_rng(seed)
    filters = list(rng.integers(0, 5, img.shape[0]))
    b = encode_png(img, filters=[int(f) for f in filters])
    assert (decode_png(b) == img).all()


@given(
    n=st.integers(1, 400),
    ch=st.integers(1, 3),
    rate=st.sampled_from([8000, 16000, 44100]),
    seed=st.integers(0, 2**32 - 1),
)
@settings(max_examples=120, deadline=None)
def test_wav_roundtrip_property(n, ch, rate, seed):
    rng = np.random.default_rng(seed)
    s = rng.integers(-32768, 32768, (n, ch), dtype=np.int16)
    out, r = decode_wav(encode_wav(s, sample_rate=rate))
    assert r == rate and out.shape == (n, ch) and (out == s).all()


@given(
    n=st.integers(0, 256),
    frame=st.integers(1, 64),
    seed=st.integers(0, 2**32 - 1),
)
@settings(max_examples=80, deadline=None)
def test_frame_features_match_bruteforce(n, frame, seed):
    rng = np.random.default_rng(seed)
    s = rng.integers(-32768, 32768, n, dtype=np.int16)
    ff = frame_features(s, frame=frame)
    assert ff.shape == (n // frame, 3)
    for i in range(n // frame):
        w = s[i * frame : (i + 1) * frame].astype(np.int64)
        assert ff[i, 0] == np.abs(w).sum()
        sg = w >= 0
        assert ff[i, 1] == int((sg[1:] != sg[:-1]).sum())
        assert ff[i, 2] == np.abs(w).max()


@given(
    h=st.integers(1, 32),
    w=st.integers(1, 32),
    oh=st.integers(1, 32),
    ow=st.integers(1, 32),
    seed=st.integers(0, 2**32 - 1),
)
@settings(max_examples=80, deadline=None)
def test_box_resample_matches_bruteforce(h, w, oh, ow, seed):
    if oh > h or ow > w:
        return  # upscale is refused by contract; covered in test_png
    rng = np.random.default_rng(seed)
    g = rng.integers(0, 256, (h, w), dtype=np.uint8)
    r = box_resample(g, ow, oh)
    assert r.shape == (oh, ow)
    for i in range(oh):
        for j in range(ow):
            y0, y1 = (i * h) // oh, ((i + 1) * h) // oh
            x0, x1 = (j * w) // ow, ((j + 1) * w) // ow
            box = g[y0:y1, x0:x1].astype(np.int64)
            area = box.size
            assert r[i, j] == (box.sum() + area // 2) // area
