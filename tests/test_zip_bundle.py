"""E6 export_zip (sources/exporters.py zip_bundles): real per-document
ZIP archives — entry round-trip through stdlib zipfile, CRC validity,
and byte-level determinism across partitionings."""

from __future__ import annotations

import hashlib
import io
import zipfile

from ocr_spark.sources.exporters import zip_bundles

SCHEMA = "doc_id string, entry_name string, payload binary"


def _rows():
    return [
        ("d1", "pages/p1.png", b"page-one-bytes"),
        ("d1", "pages/p2.png", b"page-two-bytes"),
        ("d1", "_mets.xml", b"<mets/>"),
        ("d1", "_export/_txt.txt", b"hello\n"),
        ("d2", "only.txt", b"x"),
    ]


def test_bundle_round_trip_and_crc(spark):
    out = {
        r["doc_id"]: r
        for r in zip_bundles(
            spark.createDataFrame(_rows(), SCHEMA)
        ).collect()
    }
    assert out["d1"]["n_entries"] == 4
    with zipfile.ZipFile(io.BytesIO(bytes(out["d1"]["zip"]))) as z:
        # entries sorted by name; testzip validates every CRC
        assert z.namelist() == sorted(
            n for d, n, _ in _rows() if d == "d1"
        )
        assert z.testzip() is None
        for d, n, payload in _rows():
            if d == "d1":
                assert z.read(n) == payload
        # fixed DOS-epoch stamp → reproducible bytes
        assert all(i.date_time == (1980, 1, 1, 0, 0, 0) for i in z.infolist())
    with zipfile.ZipFile(io.BytesIO(bytes(out["d2"]["zip"]))) as z:
        assert z.read("only.txt") == b"x"


def test_bundle_bytes_deterministic(spark):
    a = zip_bundles(spark.createDataFrame(_rows(), SCHEMA)).collect()
    b = zip_bundles(
        spark.createDataFrame(_rows()[::-1], SCHEMA).repartition(5)
    ).collect()
    am = {r["doc_id"]: hashlib.md5(bytes(r["zip"])).hexdigest() for r in a}
    bm = {r["doc_id"]: hashlib.md5(bytes(r["zip"])).hexdigest() for r in b}
    assert am == bm
