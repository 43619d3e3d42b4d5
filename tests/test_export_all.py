"""The composed 'download my results' journey (jobs/export_all.py
document_bundle): unzip the bundle and RE-PARSE every artifact — hOCR
back to the exact IR, ALTO back to the words, PDF through the mini
byte-validator, METS checksums against the actual entry bytes."""

from __future__ import annotations

import hashlib
import io
import re
import zipfile

from pyspark.sql import functions as F

from ocr_spark.jobs.export_all import document_bundle
from ocr_spark.sources.hocr import PAGE_IR_DDL, parse_hocr_pages

from tests.test_hocr_writer import _PAGE_A, _collect_ir, _norm
from tests.test_pdf_export import _validate as _validate_pdf


def test_document_bundle_full_journey(spark):
    ir_rows = [("docA", 1, _PAGE_A)]
    ir = spark.createDataFrame(ir_rows, PAGE_IR_DDL)
    [row] = document_bundle(ir).collect()
    assert row["n_entries"] == 5
    z = zipfile.ZipFile(io.BytesIO(bytes(row["zip"])))
    names = z.namelist()
    assert sorted(names) == [
        "_export/_alto.xml", "_export/_hocr.hocr", "_export/_pdf.pdf",
        "_export/_txt.txt", "_mets.xml",
    ]

    # txt: reading-order word join + the E1 page delimiter
    words = [w["text"] for par in _PAGE_A for line in par for w in line]
    assert z.read("_export/_txt.txt").decode() == " ".join(words) + "\n\n"

    # hOCR: parses back to the exact IR
    hocr = z.read("_export/_hocr.hocr").decode()
    back = parse_hocr_pages(
        spark.createDataFrame(
            [("docA", 1, hocr)], "doc_id string, page_no int, hocr string"
        )
    )
    assert _collect_ir(back)[("docA", 1)] == _norm(_PAGE_A)

    # ALTO: word texts in order
    alto = z.read("_export/_alto.xml").decode()
    contents = re.findall(r'CONTENT="([^"]*)"', alto)
    unesc = [
        c.replace("&amp;", "&").replace("&lt;", "<").replace("&gt;", ">")
        .replace("&quot;", '"')
        for c in contents
    ]
    assert unesc == words

    # PDF: structurally valid, text layer in reading order
    assert _validate_pdf(z.read("_export/_pdf.pdf")) == words

    # METS: every file entry's checksum matches the actual bundle bytes
    mets = z.read("_mets.xml").decode()
    entries = re.findall(
        r'CHECKSUM="([0-9a-f]{32})"[^>]*xlink:href="([^"]+)"', mets
    ) or re.findall(
        r'CHECKSUM="([0-9a-f]{32})".*?xlink:href="([^"]+)"', mets, re.S
    )
    assert len(entries) == 4
    for md5, href in entries:
        assert hashlib.md5(z.read(href)).hexdigest() == md5, href

    # determinism: same IR → byte-identical bundle
    [again] = document_bundle(
        spark.createDataFrame(ir_rows, PAGE_IR_DDL).repartition(3)
    ).collect()
    assert bytes(again["zip"]) == bytes(row["zip"])
