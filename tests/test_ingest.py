"""Binary ingest round-trip: binaryFile scan → container split → page
ordering (O1 numeric vs O2 casefold) → hOCR parse → span offsets.

The OCR seam is the documented identity fake (page payload = hOCR), so
the expected span text is fully determined by the fixtures."""

from __future__ import annotations

import os

import pytest

from ocr_spark.sources.hocr import render_hocr
from ocr_spark.sources.ingest import ingest_spans, write_pdfx, write_zip


def _page(words: list[str]) -> bytes:
    ir = [[
        [
            {"text": w, "box": [10.0 + 50 * i, 10.0, 40.0 + 50 * i, 30.0],
             "b": 0.0, "confidence": 90, "font": None}
            for i, w in enumerate(words)
        ]
    ]]
    return render_hocr(ir, page_no=1).encode()


@pytest.fixture(scope="module")
def container_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("ingest")
    # pdfx: 12 pages -> page_10/page_11 must sort numerically AFTER page_2
    write_pdfx(
        os.path.join(d, "acordao.pdfx"),
        [_page([f"p{i}", "x"]) for i in range(12)],
    )
    # zip: casefold-alphabetical order => a10 < a2 < B
    write_zip(
        os.path.join(d, "bundle.zip"),
        {"B.png": _page(["bee"]), "a10.png": _page(["a-ten"]),
         "a2.png": _page(["a-two"])},
    )
    return str(d)


def test_ingest_pdfx_numeric_order(spark, container_dir):
    spans = ingest_spans(spark, container_dir)
    rows = (
        spans.where(spans.doc_id == "acordao.pdfx")
        .orderBy("offset")
        .collect()
    )
    texts = [r["text"] for r in rows]
    # page i contributes (f"p{i}", "x"); numeric page order 0..11
    expect = [t for i in range(12) for t in (f"p{i}", "x")]
    assert texts == expect
    assert [r["offset"] for r in rows] == list(range(24))
    assert all(r["kind"] == "text" for r in rows)


def test_ingest_zip_casefold_order(spark, container_dir):
    spans = ingest_spans(spark, container_dir)
    rows = (
        spans.where(spans.doc_id == "bundle.zip").orderBy("offset").collect()
    )
    # O2: (lower(name), name) => a10.png, a2.png, B.png
    assert [r["text"] for r in rows] == ["a-ten", "a-two", "bee"]


def test_ingest_single_image(spark, tmp_path):
    p = os.path.join(tmp_path, "solo.png")
    with open(p, "wb") as f:
        f.write(_page(["only"]))
    rows = ingest_spans(spark, str(tmp_path)).collect()
    assert [(r["doc_id"], r["offset"], r["text"]) for r in rows] == [
        ("solo.png", 0, "only")
    ]


def test_tiff_ifd_walk_both_endians(spark, tmp_path):
    """S3: real multi-frame TIFF scan — IFD chain order (the reference's
    PIL seek(i) order, celery_app.py:597-652) in both byte orders."""
    from ocr_spark.sources.ingest import write_tiff

    d = tmp_path / "tiffs"
    d.mkdir()
    write_tiff(
        str(d / "doc_le.tiff"),
        [_page([f"t{i}"]) for i in range(4)],
    )
    write_tiff(
        str(d / "doc_be.tif"),
        [_page(["big0"]), _page(["big1"])],
        big_endian=True,
    )
    spans = ingest_spans(spark, str(d))
    le = [
        r["text"]
        for r in spans.where(spans.doc_id == "doc_le.tiff")
        .orderBy("offset").collect()
    ]
    assert le == ["t0", "t1", "t2", "t3"]
    be = [
        r["text"]
        for r in spans.where(spans.doc_id == "doc_be.tif")
        .orderBy("offset").collect()
    ]
    assert be == ["big0", "big1"]


def test_tiff_inline_short_left_justified(tmp_path):
    """Type-3 (SHORT) inline values must be LEFT-justified in the 4-byte
    value field (TIFF spec) so external tools read Compression=1, not 0,
    in big-endian fixtures.  Check the raw entry bytes in both orders."""
    import struct

    from ocr_spark.sources.ingest import write_tiff

    for be, bo in ((False, "<"), (True, ">")):
        p = str(tmp_path / f"j_{be}.tif")
        write_tiff(p, [b"payload"], big_endian=be)
        buf = open(p, "rb").read()
        (ifd,) = struct.unpack_from(bo + "I", buf, 4)
        (n,) = struct.unpack_from(bo + "H", buf, ifd)
        for i in range(n):
            off = ifd + 2 + 12 * i
            tag, typ, cnt = struct.unpack_from(bo + "HHI", buf, off)
            if tag == 259:
                assert typ == 3
                # value occupies the FIRST two bytes of the value field
                (val,) = struct.unpack_from(bo + "H", buf, off + 8)
                assert val == 1
                assert buf[off + 10 : off + 12] == b"\x00\x00"
                break
        else:
            raise AssertionError("no Compression tag")


def test_tiff_multi_strip_and_loop_guard():
    """The walker honors count>1 strip arrays (offset-table indirection)
    and refuses IFD-chain loops."""
    import struct

    import pytest as pt

    from ocr_spark.sources.ingest import _tiff_frames, write_tiff

    # hand-build: one frame split across two strips
    p1, p2 = b"hello-", b"strips"
    data_off = 8
    strip_tbl_off = data_off + len(p1) + len(p2)
    ifd_off = strip_tbl_off + 16  # 2 offsets + 2 counts (4 bytes each)
    buf = [b"II", struct.pack("<H", 42), struct.pack("<I", ifd_off),
           p1, p2,
           struct.pack("<2I", data_off, data_off + len(p1)),
           struct.pack("<2I", len(p1), len(p2))]
    entries = [
        (256, 4, 1, 12), (257, 4, 1, 1), (259, 3, 1, 1),
        (273, 4, 2, strip_tbl_off), (279, 4, 2, strip_tbl_off + 8),
    ]
    buf.append(struct.pack("<H", len(entries)))
    for t, ty, c, v in entries:
        buf.append(struct.pack("<HHII", t, ty, c, v))
    buf.append(struct.pack("<I", 0))
    frames = _tiff_frames(b"".join(buf))
    assert frames == [b"hello-strips"]

    # loop: next-IFD pointing back at itself
    loop = bytearray(b"".join(buf))
    loop[-4:] = struct.pack("<I", ifd_off)
    with pt.raises(ValueError, match="loop"):
        _tiff_frames(bytes(loop))

    # writer output is also readable frame-exact
    import tempfile, os as _os
    with tempfile.TemporaryDirectory() as td:
        p = _os.path.join(td, "x.tif")
        write_tiff(p, [b"A", b"BB", b"CCC"])
        assert _tiff_frames(open(p, "rb").read()) == [b"A", b"BB", b"CCC"]
