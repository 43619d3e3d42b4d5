"""Layout operators: line grouping from raw word boxes (W3) and the auto
segment reading-order sort (O3).

* ``group_lines`` — the EasyOCR line-bucketing semantics
  (server/src/engines/easy_ocr.py:15-51) exactly: scan words in input
  order; a word joins the first existing bucket (insertion order) whose
  integer range ``range(k0, k1)`` contains its ``y_max``; otherwise it
  opens a bucket keyed ``(y_max - h//2, y_max + h//2)``.  Each bucket is
  then sorted by ``x_min`` and the line baseline ``b`` is the FIRST
  bucket word's ``y_max`` (reference quirk preserved: first in insertion
  order, not in x order — easy_ocr.py:46).
* ``order_segments`` — the auto-segment sort by ``(top, left)`` of the
  first square (server/celery_app.py:156-161, image.py:298-302) as a pure
  array_sort expression.

The bucket scan is inherently sequential per page (bucket set mutates in
input order), so it runs inside the per-page loop of an Arrow batch — one
narrow mapInArrow stage, no shuffle; everything across pages is
batch-parallel.
"""

from __future__ import annotations

from collections.abc import Iterator

import pyarrow as pa

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_LINE_WORD_T = pa.struct(
    [("text", pa.string()), ("box", pa.list_(pa.float64())), ("b", pa.float64())]
)
_OUT_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("page_no", pa.int32()),
        ("lines", pa.list_(pa.list_(_LINE_WORD_T))),
    ]
)
LINES_DDL = (
    "doc_id string, page_no int, "
    "lines array<array<struct<text:string, box:array<double>, b:double>>>"
)


def group_lines_page(words: list[dict]) -> list[list[dict]]:
    """Pure-Python per-page kernel — easy_ocr.py:25-51 verbatim semantics
    (ints, dict insertion order, integer-range membership)."""
    ranges: dict[tuple[int, int], list[tuple[str, list[int]]]] = {}
    for w in words:
        box = [int(v) for v in w["box"]]
        y_min, y_max = box[1], box[3]
        diff = y_max - y_min
        for k in ranges:
            if k[0] <= y_max < k[1]:  # `y_max in range(*k)` for int y_max
                ranges[k].append((w["text"], box))
                break
        else:
            ranges[(y_max - diff // 2, y_max + diff // 2)] = [(w["text"], box)]
    lines = []
    for k, bucket in ranges.items():
        b = float(bucket[0][1][3])  # first-inserted word's y_max
        lines.append(
            [
                {"text": t, "box": [float(v) for v in bx], "b": b}
                for t, bx in sorted(bucket, key=lambda x: x[1][0])
            ]
        )
    return lines


def group_lines(df: DataFrame) -> DataFrame:
    """(doc_id, page_no, words: array<struct<text, box>>) → per-page line
    groups."""

    def fn(it: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in it:
            rows = batch.to_pylist()
            out = [
                {
                    "doc_id": r["doc_id"],
                    "page_no": r["page_no"],
                    "lines": group_lines_page(r["words"] or []),
                }
                for r in rows
            ]
            tbl = pa.Table.from_pylist(out, schema=_OUT_SCHEMA)
            yield from tbl.to_batches()

    return df.mapInArrow(fn, LINES_DDL)


def order_segments(segments: Column) -> Column:
    """O3: sort segment structs by (squares[0].top, squares[0].left) — the
    'top-left to bottom-right' auto reading order, as a pure array_sort
    comparator (celery_app.py:156-161)."""
    return F.array_sort(
        segments,
        lambda a, b: F.when(
            a["squares"][0]["top"] < b["squares"][0]["top"], F.lit(-1)
        )
        .when(a["squares"][0]["top"] > b["squares"][0]["top"], F.lit(1))
        .when(a["squares"][0]["left"] < b["squares"][0]["left"], F.lit(-1))
        .when(a["squares"][0]["left"] > b["squares"][0]["left"], F.lit(1))
        .otherwise(F.lit(0)),
    )


def page_order_key(source_type: Column, page_name: Column) -> Column:
    """The two page-ordering keys (SURVEY.md §2.4 O1 vs O2) — selected by
    source type, because they silently diverge:

    * pdf/tiff (O1): numeric — trailing integer of the page file name
      (export.py:174-175, file.py:112); ``page_10`` sorts after ``page_2``.
    * zip (O2): casefold-alphabetical ``(lower(name), name)``
      (celery_app.py:570, export.py:295); ``page_10`` sorts BEFORE
      ``page_2``.

    Returns a sortable string key: numeric keys are zero-padded to 12
    digits so lexicographic order equals numeric order.  The raw name is
    appended as a tie-break — digit-less names all extract to '' and would
    otherwise share one key, making row_number nondeterministic across
    runs/partitions.
    """
    numeric = F.concat_ws(
        "|",
        F.lpad(F.regexp_extract(page_name, r"(\d+)(?!.*\d)", 1), 12, "0"),
        page_name,
    )
    casefold = F.concat_ws("", F.lower(page_name), page_name)
    return F.when(source_type == "zip", casefold).otherwise(numeric)


def order_pages(df: DataFrame) -> DataFrame:
    """(doc_id, source_type, page_name, ...) rows → same rows with
    ``page_rank`` = the source-type-correct page position (dense, 0-based,
    per document).  One shuffle on doc_id; window rank."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("doc_id").orderBy(
        page_order_key(F.col("source_type"), F.col("page_name"))
    )
    return df.withColumn("page_rank", F.row_number().over(w) - 1)
