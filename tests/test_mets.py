"""E5 METS manifest writer: golden comparison against a hand-built
document following the reference template (create_document_mets,
server/src/utils/export.py:731-936), plus checksum/ordering invariants."""

from __future__ import annotations

import hashlib
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from ocr_spark.sources.exporters import mets_documents

CREATION = datetime(2026, 3, 1, 12, 30, 5)


def _md5(b: bytes) -> str:
    return hashlib.md5(b).hexdigest()


@pytest.fixture(scope="module")
def artifacts(spark):
    png = b"fake-png-page-1"
    alto = b"<alto/>"
    txt = b"hello world\n"
    rows = [
        ("acordao.pdf", CREATION, "IMG", 1, "_pages/acordao_1.png",
         len(png), _md5(png), "image/png"),
        ("acordao.pdf", CREATION, "ALTO", 1, "alto_schemas/acordao_1.xml",
         len(alto), _md5(alto), "text/xml"),
        ("acordao.pdf", CREATION, "TXT", 1, "_export/_txt.txt",
         len(txt), _md5(txt), "text/plain"),
    ]
    return spark.createDataFrame(
        rows,
        "doc_id string, creation timestamp, grp string, seq int, "
        "href string, size bigint, md5 string, mimetype string",
    )


def _entry(grp, seq, md5, size, mime, href):
    return (
        f'<file CHECKSUMTYPE="MD5" CHECKSUM="{md5}" GROUPID="{seq}" '
        f'ID="{grp}{seq:05d}" MIMETYPE="{mime}" SEQ="{seq}" SIZE="{size}">'
        f'<FLocat LOCTYPE="OTHER" OTHERLOCTYPE="FILE" xlink:href="{href}"/>'
        "</file>"
    )


def test_mets_golden(spark, artifacts):
    got = {r["doc_id"]: r["mets_xml"] for r in mets_documents(artifacts).collect()}
    xml = got["acordao.pdf"]

    png_md5 = _md5(b"fake-png-page-1")
    alto_md5 = _md5(b"<alto/>")
    txt_md5 = _md5(b"hello world\n")

    assert xml.startswith('<?xml version="1.0" encoding="UTF-8"?><mets ')
    assert 'CREATEDATE="2026-03-01T12:30:05"' in xml
    assert "<title>acordao</title>" in xml  # extension stripped
    assert "<name>INESC-ID LISBOA</name>" in xml

    # fileSec groups with exact reference-shaped entries
    assert (
        '<fileGrp ID="PNGGRP" USE="Images">'
        + _entry("IMG", 1, png_md5, 15, "image/png", "_pages/acordao_1.png")
        + "</fileGrp>"
    ) in xml
    assert (
        '<fileGrp ID="ALTOGRP" USE="Text">'
        + _entry("ALTO", 1, alto_md5, 7, "text/xml", "alto_schemas/acordao_1.xml")
        + "</fileGrp>"
    ) in xml
    assert (
        '<fileGrp ID="TXTGRP1" USE="Text">'
        + _entry("TXT", 1, txt_md5, 12, "text/plain", "_export/_txt.txt")
        + "</fileGrp>"
    ) in xml

    # physical structMap pairs PNG+ALTO fptrs per page (reference quirk:
    # fptr FILEIDs say PNG while file IDs say IMG — export.py:770-786)
    assert (
        '<div TYPE="Page" ORDER="1">'
        '<fptr FILEID="PNG00001"/><fptr FILEID="ALTO00001"/></div>'
    ) in xml
    # single-file structMap
    assert (
        '<div ID="DIV1" TYPE="CompleteObject"><fptr FILEID="TXT00001"/></div>'
    ) in xml
    # constant techMD block present with all six formats
    for fmt in ("image/png", "application/pdf", "text/plain",
                "text/csv", "text/xml", "application/json"):
        assert f"<formatName>{fmt}</formatName>" in xml


def test_mets_multipage_order(spark):
    """Pages arrive unordered; the structMap and file groups must come out
    in ascending page order (array_sort on (grp, seq))."""
    rows = []
    for seq in (3, 1, 2):
        body = f"png-{seq}".encode()
        rows.append(("d.pdf", CREATION, "IMG", seq, f"_pages/d_{seq}.png",
                     len(body), _md5(body), "image/png"))
        rows.append(("d.pdf", CREATION, "ALTO", seq, f"alto_schemas/d_{seq}.xml",
                     3, _md5(b"<a/>"), "text/xml"))
    df = mets_documents(
        __import__("pyspark").sql.SparkSession.getActiveSession().createDataFrame(
            rows,
            "doc_id string, creation timestamp, grp string, seq int, "
            "href string, size bigint, md5 string, mimetype string",
        )
    )
    xml = df.collect()[0]["mets_xml"]
    i1 = xml.index('ORDER="1"')
    i2 = xml.index('ORDER="2"')
    i3 = xml.index('ORDER="3"')
    assert i1 < i2 < i3
    assert xml.index("IMG00001") < xml.index("IMG00002") < xml.index("IMG00003")
