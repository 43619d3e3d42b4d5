"""Layout operators: line grouping from raw word boxes (W3), the auto
segment reading-order sort (O3), and recursive XY-cut reading-order
reconstruction (the multi-column upgrade of O3).

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
* ``xy_cut_order`` — recursive XY-cut (Nagy & Seth 1984) over block
  bounding boxes: the reading order a flat ``(top, left)`` sort gets
  WRONG on multi-column pages (it interleaves the columns row by row).
  The reference's auto order (celery_app.py:156-161) is the flat sort —
  this operator is the beyond-reference layout-analysis upgrade for the
  north rule's "reading-order reconstruction via column/block sorting".

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


def xy_cut_page(
    boxes: list[list[float]], min_gap: float = 1.0
) -> list[int]:
    """Pure-Python per-page XY-cut kernel: reading-order permutation of
    block indices.

    Recursive valley cutting, y-preferred: at every level project the
    blocks onto the y axis and split at every whitespace gap ``>=
    min_gap`` (bands ordered top to bottom); if the y projection has no
    gap, cut on x (columns ordered left to right); if neither axis has a
    gap the region is a leaf, sorted ``(top, left, idx)``.  Re-trying y
    first inside every region is equivalent to the classical axis
    alternation (a band is a merged y-run, so y immediately falls
    through to x) but also handles regions where the SAME axis cuts
    twice at different scales.

    Known XY-cut failure mode (documented, not defended): a multi-column
    page whose column-internal gaps align into full-width valleys cuts
    into horizontal slabs first — the classical algorithm's behavior.

    Runs per page; a page has tens-to-hundreds of blocks, so the
    recursion is driver-irrelevant and executor-cheap.  Boxes are
    ``[left, top, right, bottom]``.
    """

    def runs(idxs: list[int], lo_i: int, hi_i: int) -> list[list[int]]:
        ivs = sorted(
            (boxes[i][lo_i], boxes[i][hi_i], i) for i in idxs
        )
        groups = [[ivs[0][2]]]
        cur_hi = ivs[0][1]
        for lo, hi, i in ivs[1:]:
            if lo - cur_hi >= min_gap:
                groups.append([i])
            else:
                groups[-1].append(i)
            cur_hi = max(cur_hi, hi)
        return groups

    def rec(idxs: list[int]) -> list[int]:
        if len(idxs) <= 1:
            return list(idxs)
        for lo_i, hi_i in ((1, 3), (0, 2)):  # y valleys first, then x
            groups = runs(idxs, lo_i, hi_i)
            if len(groups) > 1:
                out: list[int] = []
                for grp in groups:
                    out.extend(rec(grp))
                return out
        return sorted(idxs, key=lambda i: (boxes[i][1], boxes[i][0], i))

    return rec(list(range(len(boxes))))


def xy_cut_order(df: DataFrame, min_gap: float = 1.0) -> DataFrame:
    """(doc_id, page_no, blocks: array<struct<block_id:int,
    box:array<double>>>) → one row per block with its XY-cut reading
    rank (0-based, per page).  doc_id keeps the input's type.

    Scale shape: pages are independent — one narrow mapInArrow stage,
    no shuffle, no per-page Python beyond the bounded block recursion
    (the group_lines precedent).  Mega-pages cost only their own task.
    """
    doc_id_ddl = dict(df.dtypes)["doc_id"]

    def fn(it: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in it:
            schema = pa.schema(
                [
                    ("doc_id", batch.schema.field("doc_id").type),
                    ("page_no", pa.int32()),
                    ("block_id", pa.int32()),
                    ("ord_rank", pa.int32()),
                ]
            )
            out: list[dict] = []
            for r in batch.to_pylist():
                blocks = r["blocks"] or []
                order = xy_cut_page([b["box"] for b in blocks], min_gap)
                out.extend(
                    {
                        "doc_id": r["doc_id"],
                        "page_no": r["page_no"],
                        "block_id": blocks[i]["block_id"],
                        "ord_rank": rank,
                    }
                    for rank, i in enumerate(order)
                )
            tbl = pa.Table.from_pylist(out, schema=schema)
            yield from tbl.to_batches()

    return df.select("doc_id", "page_no", "blocks").mapInArrow(
        fn, f"doc_id {doc_id_ddl}, page_no int, block_id int, ord_rank int"
    )


def order_pages(df: DataFrame) -> DataFrame:
    """(doc_id, source_type, page_name, ...) rows → same rows with
    ``page_rank`` = the source-type-correct page position (dense, 0-based,
    per document).  One shuffle on doc_id; window rank."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("doc_id").orderBy(
        page_order_key(F.col("source_type"), F.col("page_name"))
    )
    return df.withColumn("page_rank", F.row_number().over(w) - 1)
