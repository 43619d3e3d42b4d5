"""G1-G5 raster page segmentation — the reference's image→regions
pipeline (server/src/utils/image.py:140-227) rebuilt pure-numpy over
DECODED grayscale bitmaps, as an Arrow-batched kernel.

Stage map (reference → here):

* G1 Otsu binarization (``cv2.threshold(..., THRESH_OTSU)``) → the
  exact Otsu between-class-variance argmax over the 256-bin histogram
  (`_otsu`) — same algorithm, same threshold value.
* G2 ruling-line detection/removal (``find_lines`` with
  ``line_scale=15`` + ``remove_lines``) → run-length masks: an ink run
  spanning ≥ dim/15 consecutive pixels in a row (resp. column) is a
  horizontal (vertical) ruling and is erased before segmentation
  (`_line_mask`).  Morphological open with a 1×(dim/15) kernel and a
  maximal-run test agree on axis-aligned rulings — the case the
  reference targets (table borders, separators).
* G3 contour extraction (``cv2.findContours`` RETR_EXTERNAL) → exact
  4-connected component labeling via row-run union-find
  (`_components`); emits each component's bounding box like
  ``boundingRect``.
* G4 HDBSCAN corner-point clustering + per-cluster MER merge →
  deterministic ε-dilated box merging to a fixpoint (`_merge_boxes`):
  boxes whose dilation by ``eps·page_dim`` (the reference's
  ``cluster_selection_epsilon=0.025`` on dim-normalized points)
  overlap, merge transitively into one region rectangle.  HDBSCAN is
  not in the sandbox and is non-deterministic across versions; the
  ε-merge serves the same role (group glyph boxes into region rects)
  and is exactly reproducible — the documented substitution.
* G5 region typing → ink-density + size heuristic (dense large block =
  'image', else 'text'); the reference's kind labels ultimately come
  from its classifier/user input (SURVEY §2.10), so this is the
  classifier seam's deterministic default, swap-ready.

Input: ``doc_id string, page_no int, width int, height int, bitmap
binary`` — row-major uint8 grayscale (decode from PNG/JPEG is the
multimodal codec seam; this operator starts where decode hands off).
Output: one row per region — ``doc_id, page_no, region_idx, kind,
x1, y1, x2, y2, n_components, ink_frac``.

Scale shape: one narrow mapInArrow stage, no shuffle; per-page work is
O(ink runs) via the run-length labeling (never per-pixel Python), and
pages are independent.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame

LINE_SCALE = 15        # reference find_lines line_scale
MERGE_EPS = 0.025      # reference cluster_selection_epsilon (dim-normalized)
MIN_COMPONENT_AREA = 4 # speck filter (the min_samples noise-culling role)
IMAGE_DENSITY = 0.5    # region ink fraction ⇒ 'image'
IMAGE_MIN_FRAC = 0.02  # and region area ≥ 2% of the page

_OUT_DDL = (
    "doc_id string, page_no int, region_idx int, kind string, "
    "x1 int, y1 int, x2 int, y2 int, n_components int, ink_frac double"
)


def _otsu(gray: np.ndarray) -> int:
    """Exact Otsu threshold (the THRESH_OTSU algorithm): maximize
    between-class variance over the 256-bin histogram; ties → lowest
    threshold (argmax first-max)."""
    hist = np.bincount(gray.ravel(), minlength=256).astype(np.float64)
    total = hist.sum()
    if total == 0:
        return 0
    w0 = np.cumsum(hist)
    m = np.cumsum(hist * np.arange(256))
    mu_total = m[-1]
    w1 = total - w0
    valid = (w0 > 0) & (w1 > 0)
    between = np.zeros(256)
    between[valid] = (mu_total * w0 - total * m)[valid] ** 2 / (
        w0 * w1 * total * total
    )[valid]
    return int(np.argmax(between))


def _runs(row: np.ndarray) -> list[tuple[int, int]]:
    """[start, end) runs of True in a 1-D bool array."""
    d = np.diff(row.astype(np.int8))
    starts = np.flatnonzero(d == 1) + 1
    ends = np.flatnonzero(d == -1) + 1
    if row[0]:
        starts = np.concatenate(([0], starts))
    if row[-1]:
        ends = np.concatenate((ends, [len(row)]))
    return list(zip(starts.tolist(), ends.tolist()))


def _runs2d(m: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """All [start, end) True runs of every row in ONE vectorized pass:
    a sentinel False column stops runs at row ends, the padded array
    flattens, and one diff locates all boundaries.  Returns (rows,
    starts, ends) sorted by (row, start) — the same order the per-row
    loop produced."""
    h, w = m.shape
    padded = np.zeros((h, w + 1), dtype=bool)
    padded[:, :w] = m
    flat = padded.ravel()
    d = np.diff(flat.astype(np.int8))
    starts = np.flatnonzero(d == 1) + 1
    ends = np.flatnonzero(d == -1) + 1
    if flat[0]:
        starts = np.concatenate(([0], starts))
    rows = starts // (w + 1)
    return rows, starts - rows * (w + 1), ends - rows * (w + 1)


def _line_mask(ink: np.ndarray, scale: int = LINE_SCALE) -> np.ndarray:
    """Ruling mask: maximal ink runs spanning ≥ dim/scale pixels AND
    thin in the cross direction (find_lines over the reference's
    ADAPTIVE threshold only responds to thin strokes — a solid image
    block never registers as a ruling; the thinness gate reproduces
    that without a local-mean filter)."""
    h, w = ink.shape
    thin = max(3, min(h, w) // 150)

    def select_runs(m: np.ndarray, lo=None, hi=None):
        rows, s, e = _runs2d(m)
        ln = e - s
        keep = np.ones(len(rows), dtype=bool)
        if lo is not None:
            keep &= ln >= lo
        if hi is not None:
            keep &= ln <= hi
        return rows[keep], s[keep], e[keep]

    long_h = np.zeros_like(ink, dtype=bool)
    for y, s, e in zip(*select_runs(ink, lo=max(w // scale, 2))):
        long_h[y, s:e] = True
    mask = np.zeros_like(ink, dtype=bool)
    for x, s, e in zip(*select_runs(long_h.T.copy(), hi=thin)):
        mask[s:e, x] = True
    long_v = np.zeros_like(ink, dtype=bool)
    for x, s, e in zip(*select_runs(ink.T.copy(), lo=max(h // scale, 2))):
        long_v[s:e, x] = True
    for y, s, e in zip(*select_runs(long_v, hi=thin)):
        mask[y, s:e] = True
    return mask


def _components(ink: np.ndarray) -> list[tuple[int, int, int, int, int]]:
    """4-connected components via row-run union-find: O(runs), never
    per-pixel Python.  Returns (x1, y1, x2, y2, area) per component
    (x2/y2 exclusive)."""
    parent: list[int] = []

    def find(a: int) -> int:
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[rb] = ra

    r_rows, r_s, r_e = _runs2d(ink)
    n_runs = len(r_rows)
    parent.extend(range(n_runs))
    run_info = list(zip(r_rows.tolist(), r_s.tolist(), r_e.tolist()))
    # row boundaries in the (row-sorted) run arrays
    row_start = np.searchsorted(r_rows, np.arange(ink.shape[0] + 1))
    for y in range(1, ink.shape[0]):
        i, iend = row_start[y - 1], row_start[y]
        j, jend = row_start[y], row_start[y + 1]
        # union with overlapping runs of the previous row (two-pointer)
        while i < iend and j < jend:
            if r_s[i] < r_e[j] and r_s[j] < r_e[i]:  # 4-connected
                union(i, j)
            if r_e[i] <= r_e[j]:
                i += 1
            else:
                j += 1
    # resolve boxes
    agg: dict[int, list[int]] = {}
    for lab, (y, s, e) in enumerate(run_info):
        r = find(lab)
        b = agg.get(r)
        if b is None:
            agg[r] = [s, y, e, y + 1, e - s]
        else:
            b[0] = min(b[0], s)
            b[2] = max(b[2], e)
            b[3] = y + 1
            b[4] += e - s
    return [tuple(v) for v in agg.values()]


def _merge_boxes(
    boxes: list[tuple[int, int, int, int, int]],
    eps_x: float,
    eps_y: float,
) -> list[tuple[int, int, int, int, int, int]]:
    """ε-dilated transitive box merge to a fixpoint (the HDBSCAN-cluster
    → MER substitution).  Returns (x1, y1, x2, y2, n_components, area)
    region rectangles, sorted by (y1, x1)."""
    regions = [list(b) + [1] for b in boxes]  # x1,y1,x2,y2,area,n
    changed = True
    while changed:
        changed = False
        out: list[list[int]] = []
        for r in regions:
            merged = False
            for o in out:
                if (
                    r[0] - eps_x < o[2] + eps_x
                    and o[0] - eps_x < r[2] + eps_x
                    and r[1] - eps_y < o[3] + eps_y
                    and o[1] - eps_y < r[3] + eps_y
                ):
                    o[0] = min(o[0], r[0])
                    o[1] = min(o[1], r[1])
                    o[2] = max(o[2], r[2])
                    o[3] = max(o[3], r[3])
                    o[4] += r[4]
                    o[5] += r[5]
                    merged = changed = True
                    break
            if not merged:
                out.append(r)
        regions = out
    return sorted(
        [(r[0], r[1], r[2], r[3], r[5], r[4]) for r in regions],
        key=lambda r: (r[1], r[0]),
    )


def segment_page(
    gray: np.ndarray,
) -> list[tuple[str, int, int, int, int, int, float]]:
    """One page: grayscale HxW uint8 → [(kind, x1, y1, x2, y2,
    n_components, ink_frac)] in reading order."""
    h, w = gray.shape
    if h == 0 or w == 0:
        return []
    thr = _otsu(gray)
    ink = gray <= thr  # THRESH_BINARY_INV: dark = ink
    ink = ink & ~_line_mask(ink)
    comps = [
        c for c in _components(ink) if c[4] >= MIN_COMPONENT_AREA
    ]
    page_area = float(h * w)
    out = []
    for x1, y1, x2, y2, n, area in _merge_boxes(
        comps, MERGE_EPS * w, MERGE_EPS * h
    ):
        box_area = float(max((x2 - x1) * (y2 - y1), 1))
        ink_frac = area / box_area
        kind = (
            "image"
            if ink_frac >= IMAGE_DENSITY
            and box_area / page_area >= IMAGE_MIN_FRAC
            else "text"
        )
        out.append((kind, x1, y1, x2, y2, n, round(ink_frac, 6)))
    return out


def segment_bitmaps(pages: DataFrame) -> DataFrame:
    """(doc_id, page_no, width, height, bitmap) → one row per region.
    Narrow Arrow kernel, no shuffle."""
    def fn(it: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in it:
            d = batch.to_pydict()
            rows: list = []
            for doc, pno, wd, ht, bm in zip(
                d["doc_id"], d["page_no"], d["width"], d["height"],
                d["bitmap"],
            ):
                buf = np.frombuffer(bm or b"", dtype=np.uint8)
                if len(buf) < wd * ht or wd <= 0 or ht <= 0:
                    # malformed page: marker row, never a stage-killing
                    # reshape error (the warc parse_ok=false convention)
                    rows.append((doc, pno, 0, "corrupt", 0, 0, 0, 0, 0, 0.0))
                    continue
                gray = buf[: wd * ht].reshape(ht, wd)
                for i, (kind, x1, y1, x2, y2, n, frac) in enumerate(
                    segment_page(gray)
                ):
                    rows.append(
                        (doc, pno, i, kind, x1, y1, x2, y2, n, frac)
                    )
            cols = list(zip(*rows)) if rows else [[] for _ in range(10)]
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(cols[0], type=pa.string()),
                    pa.array(cols[1], type=pa.int32()),
                    pa.array(cols[2], type=pa.int32()),
                    pa.array(cols[3], type=pa.string()),
                    pa.array(cols[4], type=pa.int32()),
                    pa.array(cols[5], type=pa.int32()),
                    pa.array(cols[6], type=pa.int32()),
                    pa.array(cols[7], type=pa.int32()),
                    pa.array(cols[8], type=pa.int32()),
                    pa.array(cols[9], type=pa.float64()),
                ],
                names=[
                    "doc_id", "page_no", "region_idx", "kind",
                    "x1", "y1", "x2", "y2", "n_components", "ink_frac",
                ],
            )

    return pages.mapInArrow(fn, _OUT_DDL)


_PAGE_DDL = (
    "doc_id string, page_no int, width int, height int, bitmap binary"
)


def decode_png_pages(pages: DataFrame) -> DataFrame:
    """(doc_id, page_no, content binary) → the ``segment_bitmaps`` input
    shape, through the REAL in-repo decoders (sources/imagecodec.py
    sniff-dispatch): PNG or baseline-JPEG bytes → pixels → integer
    Rec.601 grayscale.  This closes the G-chain end-to-end — the
    reference renders every page to PNG (celery_app.py:903-913) and
    segments the decoded raster (image.py:140-227), while uploaded
    single images keep their original (often JPEG) extension
    (src/utils/file.py:92-98); here the same bytes flow
    decode → Otsu → components → regions with no codec seam left.

    Corrupt/undecodable rows degrade to ``width=0, height=0, bitmap=''``
    which ``segment_bitmaps`` turns into its 'corrupt' marker row — one
    bad page never kills the stage.  One narrow Arrow-batched map;
    decoded bitmaps stay inside the stage (compose with
    ``segment_bitmaps`` before any shuffle so only slim region rows move).
    """
    import pandas as pd

    from ocr_spark.sources.imagecodec import sniff_decode
    from ocr_spark.sources.png import to_gray

    def fn(it):
        for pdf in it:
            rows = []
            for doc, pno, content in zip(
                pdf["doc_id"], pdf["page_no"], pdf["content"]
            ):
                b = bytes(content) if content is not None else b""
                img = sniff_decode(b)
                if img is not None:
                    gray = to_gray(img)
                    h, w = gray.shape
                    rows.append((doc, pno, w, h, gray.tobytes()))
                else:
                    rows.append((doc, pno, 0, 0, b""))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "page_no", "width", "height", "bitmap"],
            )

    return pages.mapInPandas(fn, _PAGE_DDL)
