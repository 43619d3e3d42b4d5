"""WARC record scan — the container format of every public web crawl.

The reference ingests documents one upload at a time (Flask endpoints,
server/app.py); a 10^12-document corpus arrives instead as WARC files
(ISO 28500 — Common Crawl's format), so the crawl-side ingest leg of this
engine needs the record walk: a WARC file is a concatenation of

    WARC/1.0\\r\\n
    <Header-Name>: <value>\\r\\n ...
    \\r\\n
    <content block of exactly Content-Length BYTES>
    \\r\\n\\r\\n

Correctness subtlety this module exists for: record boundaries are found
by HONORING ``Content-Length``, never by splitting on the ``WARC/`` magic
— response payloads routinely contain the magic themselves (a page QUOTING
a WARC file), and a split-based parser shears those records in half.  The
pytest battery plants exactly that payload.

Scale shape: one file = one input row through a narrow ``mapInArrow``
stage — no shuffle, record fan-out happens inside the Arrow batch (the
``sample_frames`` container-walk precedent, multimodal.py).  Real crawl
archives are ~1 GB per file, which is big-cell but workable at
``maxPartitionBytes`` granularity because each file is its own task; a
streaming split below the row level would need a custom DataSource —
out of scope, documented here as the seam.

Headers are case-insensitive per the spec (parsed into a lowercased map);
``WARC-Type``, ``WARC-Target-URI`` and ``Content-Type`` are projected out,
the rest ride in the map.  A malformed tail (missing magic, truncated
content) ends the walk for that file; complete records already emitted
survive, and ``n_truncated`` flags the file via the trailing marker row
count (parse_ok=false).
"""

from __future__ import annotations

from collections.abc import Iterator

import pyarrow as pa

from pyspark.sql import DataFrame

_CRLF = "\r\n"
_HDR_END = "\r\n\r\n"

WARC_OUT_DDL = (
    "file_id bigint, rec_idx int, warc_type string, target_uri string, "
    "content_type string, content_length bigint, payload string, "
    "parse_ok boolean"
)
_WARC_SCHEMA = pa.schema(
    [
        ("file_id", pa.int64()),
        ("rec_idx", pa.int32()),
        ("warc_type", pa.string()),
        ("target_uri", pa.string()),
        ("content_type", pa.string()),
        ("content_length", pa.int64()),
        ("payload", pa.string()),
        ("parse_ok", pa.bool_()),
    ]
)


def parse_warc(content: str) -> tuple[list[dict], bool]:
    """Pure-Python per-file kernel: walk the records of one WARC file.

    Returns ``(records, ok)`` — ``ok`` False iff the walk hit a malformed
    region (records before it are still returned).  Operates on str; for
    byte-exact walking of non-ASCII archives the caller decodes latin-1
    (lossless byte<->char), keeping offsets == byte offsets.
    """
    out: list[dict] = []
    pos = 0
    n = len(content)
    while pos < n:
        if not content.startswith("WARC/", pos):
            return out, False
        hdr_end = content.find(_HDR_END, pos)
        if hdr_end < 0:
            return out, False
        headers: dict[str, str] = {}
        # first line is the version; the rest are Name: value
        for line in content[pos:hdr_end].split(_CRLF)[1:]:
            name, sep, value = line.partition(":")
            if sep:
                headers[name.strip().lower()] = value.strip()
        try:
            clen = int(headers["content-length"])
        except (KeyError, ValueError):
            return out, False
        body_start = hdr_end + len(_HDR_END)
        body_end = body_start + clen
        # every record, including the last, ends with \r\n\r\n
        if body_end + len(_HDR_END) > n or (
            content[body_end : body_end + len(_HDR_END)] != _HDR_END
        ):
            return out, False
        out.append(
            {
                "rec_idx": len(out),
                "warc_type": headers.get("warc-type"),
                "target_uri": headers.get("warc-target-uri"),
                "content_type": headers.get("content-type"),
                "content_length": clen,
                "payload": content[body_start:body_end],
            }
        )
        pos = body_end + len(_HDR_END)
    return out, True


def warc_records(df: DataFrame) -> DataFrame:
    """(file_id: bigint, content: string|binary) → one row per WARC
    record: (file_id, rec_idx, warc_type, target_uri, content_type,
    content_length, payload, parse_ok).

    ``parse_ok`` is per-file (repeated on each of its rows); a file whose
    very first record is malformed emits one marker row with null record
    fields so the failure is visible in the output rather than silent.
    """

    def fn(it: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in it:
            out: list[dict] = []
            for r in batch.to_pylist():
                content = r["content"]
                if isinstance(content, (bytes, bytearray)):
                    content = bytes(content).decode("latin-1")
                recs, ok = parse_warc(content or "")
                if not recs:
                    out.append(
                        {
                            "file_id": r["file_id"],
                            "rec_idx": None,
                            "warc_type": None,
                            "target_uri": None,
                            "content_type": None,
                            "content_length": None,
                            "payload": None,
                            "parse_ok": ok,
                        }
                    )
                    continue
                out.extend(
                    {"file_id": r["file_id"], "parse_ok": ok, **rec}
                    for rec in recs
                )
            tbl = pa.Table.from_pylist(out, schema=_WARC_SCHEMA)
            yield from tbl.to_batches()

    return df.select("file_id", "content").mapInArrow(fn, WARC_OUT_DDL)


# --- HTTP response-head metadata (http_response_meta; twin in -----------
# --- __spark_entry__) — shared Spark/DuckDB constants --------------------

# Status line: protocol, then the 3-digit code.
HTTP_STATUS_RE = r"(?is)^http/[0-9.]+\s+([0-9]{3})"
# The response head = everything before the first blank line.
HTTP_HEAD_RE = r"(?s)^(.*?)\r\n\r\n"
# Body = the head plus terminator removed; a payload with no terminator
# is all head, empty body (shared semantics).
HTTP_BODY_STRIP_RE = r"(?s)^.*?\r\n\r\n"
# Header lines are CRLF-separated; (?m)^ anchors after \n in both RE2
# and Java.  MIME stops at ';' (parameters) or line end.
HTTP_CTYPE_RE = r"(?im)^content-type:\s*([^\r\n;]+)"
HTTP_CHARSET_RE = r"(?is)charset\s*=\s*\"?([A-Za-z0-9_-]+)"


def http_response_meta(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """HTTP response payload → typed fetch metadata + body — the filter
    gate between the WARC record walk and content extraction: a real
    crawl keeps only ``status == 200`` + ``text/html`` responses (the
    CommonCrawl WET-extraction precondition), and charset drives decode
    routing.

    Adds to the frame: ``status int`` (NULL when the payload has no
    HTTP status line), ``mime string`` (lowercased, parameters
    stripped; '' when absent), ``charset string`` (lowercased, '' when
    undeclared), ``body string`` (payload after the first CRLF-CRLF;
    '' when no terminator — a head-only or malformed response), and
    ``keep boolean`` = status 200 AND mime text/html.

    Pure-Catalyst zero-shuffle projection; the head is staged ONCE and
    every attribute regex reads the staged column (BENCH/BASELINE.md §3
    rule).  All regexes Java↔RE2-agreeing, so the driver query has an
    exact DuckDB twin built from THESE constants.
    """
    from pyspark.sql import functions as F

    p = F.col(payload_col)
    staged = df.withColumn("_head", F.regexp_extract(p, HTTP_HEAD_RE, 1))
    h = F.col("_head")
    out = (
        staged.withColumn(
            "status",
            F.regexp_extract(h, HTTP_STATUS_RE, 1).try_cast("int"),
        )
        .withColumn(
            "mime",
            F.lower(F.trim(F.regexp_extract(h, HTTP_CTYPE_RE, 1))),
        )
        .withColumn(
            "charset",
            F.lower(F.regexp_extract(h, HTTP_CHARSET_RE, 1)),
        )
        .withColumn(
            "body",
            F.when(
                p.rlike(HTTP_HEAD_RE),
                F.regexp_replace(p, HTTP_BODY_STRIP_RE, ""),
            ).otherwise(F.lit("")),
        )
        .withColumn(
            "keep",
            F.coalesce(
                (F.col("status") == 200) & (F.col("mime") == "text/html"),
                F.lit(False),
            ),
        )
    )
    return out.drop("_head")
