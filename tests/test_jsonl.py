"""JSONL training export (sources/exporters.py jsonl_records): every
line must parse back to the source row (round-trip property) and match
Python's compact json.dumps byte-for-byte on the escaped set."""

import json

import pytest

from ocr_spark.sources.exporters import jsonl_records

ROWS = [
    (1, "plain prose", "en", "src1"),
    (2, 'he said "hi"', "en", "src1"),
    (3, "back\\slash and \\\\double", "pt", "src2"),
    (4, "line\nbreak\ttab\rcr", "en", "src1"),
    (5, "unicode café — naïve", "fr", "src3"),
    (6, None, "en", "src1"),
    (7, "", None, None),
]


@pytest.fixture(scope="module")
def lines(spark):
    docs = spark.createDataFrame(
        ROWS, "doc_id bigint, text string, lang string, source string"
    )
    return {r["doc_id"]: r["value"] for r in jsonl_records(docs).collect()}


def test_round_trip_parses_back_to_the_row(lines):
    for doc_id, text, lang, source in ROWS:
        obj = json.loads(lines[doc_id])
        assert obj == {
            "doc_id": doc_id, "text": text, "lang": lang, "source": source
        }


def test_bytes_match_compact_json_dumps(lines):
    for doc_id, text, lang, source in ROWS:
        expect = json.dumps(
            {"doc_id": doc_id, "text": text, "lang": lang, "source": source},
            separators=(",", ":"),
            ensure_ascii=False,
        )
        assert lines[doc_id] == expect


def test_null_fields_render_as_json_null(lines):
    assert '"text":null' in lines[6]
    assert lines[7].endswith('"lang":null,"source":null}')
