"""WARC record-walk tests (sources/warc.py) — Content-Length honoring,
magic-in-payload robustness, malformed tails, header case-insensitivity."""

from __future__ import annotations

from ocr_spark.sources.warc import parse_warc, warc_records


def _rec(
    payload: str,
    warc_type: str = "response",
    uri: str = "https://e.org/x",
    extra: str = "",
    clen: int | None = None,
) -> str:
    n = len(payload) if clen is None else clen
    return (
        f"WARC/1.0\r\nWARC-Type: {warc_type}\r\n"
        f"WARC-Target-URI: {uri}\r\n{extra}"
        f"Content-Type: text/plain\r\nContent-Length: {n}\r\n\r\n"
        f"{payload}\r\n\r\n"
    )


def test_parse_two_records_round_trip():
    recs, ok = parse_warc(_rec("hello") + _rec("world", uri="https://e.org/y"))
    assert ok and len(recs) == 2
    assert [r["payload"] for r in recs] == ["hello", "world"]
    assert recs[0]["rec_idx"] == 0 and recs[1]["rec_idx"] == 1
    assert recs[1]["target_uri"] == "https://e.org/y"
    assert recs[0]["content_length"] == 5


def test_magic_inside_payload_not_split():
    """The reason the walk honors Content-Length: a payload QUOTING a WARC
    record must stay one record (a split-on-magic parser shears it)."""
    evil = "see: WARC/1.0\r\n\r\nContent-Length: 0\r\n\r\n inside a page"
    recs, ok = parse_warc(_rec(evil) + _rec("after"))
    assert ok and len(recs) == 2
    assert recs[0]["payload"] == evil
    assert recs[1]["payload"] == "after"


def test_truncated_tail_keeps_complete_records():
    body = _rec("complete") + "WARC/1.0\r\nContent-Length: 100\r\n\r\nshort"
    recs, ok = parse_warc(body)
    assert not ok and len(recs) == 1
    assert recs[0]["payload"] == "complete"


def test_missing_magic_and_missing_length():
    assert parse_warc("HTTP/1.1 200 OK\r\n\r\n") == ([], False)
    recs, ok = parse_warc("WARC/1.0\r\nWARC-Type: response\r\n\r\nx\r\n\r\n")
    assert not ok and recs == []
    assert parse_warc("") == ([], True)


def test_headers_case_insensitive_and_crlf_only():
    raw = (
        "WARC/1.0\r\ncontent-length: 3\r\nwarc-type: request\r\n"
        "WARC-TARGET-URI: u\r\nCONTENT-TYPE: t\r\n\r\nabc\r\n\r\n"
    )
    recs, ok = parse_warc(raw)
    assert ok and recs[0]["warc_type"] == "request"
    assert recs[0]["target_uri"] == "u"
    assert recs[0]["content_type"] == "t"
    assert recs[0]["payload"] == "abc"


def test_payload_length_honored_exactly():
    # declared length shorter than the text before the terminator → the
    # terminator check fails (spec violation) and the walk stops
    recs, ok = parse_warc(_rec("abcdef", clen=3))
    assert not ok and recs == []


def test_warc_records_operator(spark):
    good = _rec("hello") + _rec("WARC/1.0 quoted", uri="https://e.org/q")
    bad = "not a warc"
    df = spark.createDataFrame(
        [(1, good), (2, bad)], "file_id bigint, content string"
    )
    rows = {
        (r["file_id"], r["rec_idx"]): r
        for r in warc_records(df).collect()
    }
    assert rows[(1, 0)]["payload"] == "hello"
    assert rows[(1, 1)]["payload"] == "WARC/1.0 quoted"
    assert rows[(1, 0)]["parse_ok"] is True
    # malformed file → one visible marker row, not silence
    assert rows[(2, None)]["parse_ok"] is False
    assert rows[(2, None)]["payload"] is None


def test_warc_records_operator_binary_input(spark):
    content = _rec("bytes-payload").encode("latin-1")
    df = spark.createDataFrame(
        [(7, bytearray(content))], "file_id bigint, content binary"
    )
    got = warc_records(df).collect()
    assert len(got) == 1 and got[0]["payload"] == "bytes-payload"


def test_warc_html_round_trip_invisible(spark):
    """The composed chain (serialize → WARC walk → HTTP strip →
    html_spans) must equal html_spans run directly on the same pages."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "entry_warc_test", "/root/repo/__spark_entry__.py"
    )
    e = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(e)
    sf = "/root/testdata/sf0.001"
    via_warc = sorted(
        map(tuple, e.q_warc_html(spark, sf).collect())
    )
    direct = sorted(map(tuple, e.q_html_extract(spark, sf).collect()))
    assert via_warc == direct and len(direct) > 0
