"""http_response_meta (sources/warc.py): status/mime/charset/body split
of HTTP response payloads and the keep-200-text/html gate — every branch
pinned, plus the zero-Exchange plan.

The cross-engine gate is the driver parity harness (``http_meta`` twin);
these tests pin the semantics.
"""

from __future__ import annotations

from ocr_spark.sources.warc import http_response_meta

CRLF = "\r\n"


def _one(spark, payload: str):
    df = spark.createDataFrame(
        [(1, payload)], "doc_id int, payload string"
    )
    return http_response_meta(df).collect()[0]


def test_kept_html_response(spark):
    r = _one(
        spark,
        "HTTP/1.1 200 OK" + CRLF
        + "Content-Type: text/html; charset=utf-8" + CRLF
        + "Server: x" + CRLF + CRLF
        + "<html>body here</html>",
    )
    assert (r.status, r.mime, r.charset, r.keep) == (
        200, "text/html", "utf-8", True,
    )
    assert r.body == "<html>body here</html>"


def test_caps_header_and_quoted_charset(spark):
    r = _one(
        spark,
        "HTTP/1.0 200 OK" + CRLF
        + 'CONTENT-TYPE: Text/HTML; charset="ISO-8859-1"' + CRLF + CRLF
        + "x",
    )
    assert (r.mime, r.charset, r.keep) == ("text/html", "iso-8859-1", True)


def test_non_200_and_non_html_dropped(spark):
    r404 = _one(
        spark,
        "HTTP/1.1 404 Not Found" + CRLF
        + "Content-Type: text/html" + CRLF + CRLF + "nope",
    )
    rpdf = _one(
        spark,
        "HTTP/1.1 200 OK" + CRLF
        + "Content-Type: application/pdf" + CRLF + CRLF + "%PDF",
    )
    assert (r404.status, r404.keep) == (404, False)
    assert (rpdf.mime, rpdf.keep) == ("application/pdf", False)


def test_no_status_line_and_head_only(spark):
    garbage = _one(spark, "not http at all")
    assert garbage.status is None and garbage.keep is False
    assert garbage.body == ""  # no terminator → all head, empty body
    head_only = _one(spark, "HTTP/1.1 200 OK" + CRLF + "Content-Type: text/html")
    assert head_only.body == "" and head_only.status is None
    # (status is read from the STAGED head, which needs the terminator —
    # a truncated response is not a fetch worth keeping)
    assert head_only.keep is False


def test_body_may_contain_crlf_crlf(spark):
    r = _one(
        spark,
        "HTTP/1.1 200 OK" + CRLF
        + "Content-Type: text/html" + CRLF + CRLF
        + "first" + CRLF + CRLF + "second",
    )
    # Only the FIRST terminator splits; the body keeps its own blank lines.
    assert r.body == "first" + CRLF + CRLF + "second"


def test_zero_exchange_plan(spark):
    df = spark.createDataFrame(
        [(1, "HTTP/1.1 200 OK\r\n\r\nx")], "doc_id int, payload string"
    )
    plan = (
        http_response_meta(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
