"""Pure-Python PNG codec — the real pixel path behind the multimodal
codec seam.

The reference stores every page raster as a PNG it writes itself
(server/celery_app.py:903-913, pdfium ``save_png``; crops at
celery_app.py:1062-1081 likewise) — so PNG is the one image format the
engine must actually decode, and PNG's critical chunks need nothing
beyond stdlib ``zlib`` (inflate + crc32) and numpy (unfiltering math).
No PIL/cv2 required: this module closes the round-3 "documented fake
decode" seam with a real decoder.

Scope (documented, raised-on otherwise):
* bit depth 8 for all five color types — gray(0), RGB(2), palette(3),
  gray+alpha(4), RGBA(6) — plus bit depth 1 grayscale (bitonal scans,
  the document-archive common case) and bit depth 16 for the non-palette
  types (decoded to 8-bit by the standard high-byte downsample);
* both interlace methods — non-interlaced (the reference's own PNGs)
  and Adam7 (crawled-corpus PNGs), r5;
* all five scanline filters (None/Sub/Up/Average/Paeth) on decode, and
  the encoder can emit any of them (tests drive every filter path).

Execution shape: the codec is called ONLY from inside Arrow-batched
``mapInPandas``/``mapInArrow`` kernels (operators/multimodal.py,
operators/raster.py), so decode cost is distributed with the binary
column and amortized per batch; nothing here touches the driver.  The
per-row unfilter loop is numpy-vectorized for filters 0/1/2 (cumsum /
wrap-add identities) and per-pixel only for Average/Paeth rows, which
is plenty for page rasters at test scale — on a production cluster the
same call sites take a native codec behind this exact signature.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"

#: Adam7 pass sampling grids (x_start, y_start, x_step, y_step), PNG §8.2
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)

#: channels per pixel, by color type
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def is_png(data: bytes) -> bool:
    """Cheap signature sniff — the dispatch test the multimodal seam uses
    to route real PNGs to this decoder and anything else to the
    deterministic fake."""
    return len(data) >= 8 and data[:8] == PNG_SIG


def png_size(data: bytes) -> tuple[int, int]:
    """(width, height) from IHDR without decompressing pixel data."""
    if not is_png(data) or len(data) < 24:
        raise ValueError("not a PNG")
    w, h = struct.unpack_from(">II", data, 16)
    return w, h


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def _chunk(typ: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + typ
        + payload
        + struct.pack(">I", zlib.crc32(typ + payload) & 0xFFFFFFFF)
    )


def _filter_row(
    ftype: int, row: np.ndarray, prev: np.ndarray, bpp: int
) -> np.ndarray:
    """Apply filter ``ftype`` to one scanline (forward direction —
    trivially vectorizable; the inverse is the sequential one)."""
    r = row.astype(np.int64)
    left = np.zeros_like(r)
    left[bpp:] = r[:-bpp]
    up = prev.astype(np.int64)
    upleft = np.zeros_like(up)
    upleft[bpp:] = up[:-bpp]
    if ftype == 0:
        out = r
    elif ftype == 1:
        out = r - left
    elif ftype == 2:
        out = r - up
    elif ftype == 3:
        out = r - ((left + up) >> 1)
    elif ftype == 4:
        p = left + up - upleft
        pa, pb, pc = (
            np.abs(p - left), np.abs(p - up), np.abs(p - upleft)
        )
        pred = np.where(
            (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, upleft)
        )
        out = r - pred
    else:
        raise ValueError(f"bad filter type {ftype}")
    return (out % 256).astype(np.uint8)


def encode_png(
    arr: np.ndarray,
    filters: int | list[int] | str = "auto",
    compress_level: int = 6,
) -> bytes:
    """uint8 array → PNG bytes.  (H, W) → grayscale; (H, W, 2) →
    gray+alpha; (H, W, 3) → RGB; (H, W, 4) → RGBA.  ``filters`` is a
    single filter type for every row, an explicit per-row list (tests
    use this to exercise each unfilter path), or ``"auto"`` (minimum
    sum-of-abs heuristic, the libpng default strategy)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        color_type, channels = 0, 1
        a = a[:, :, None]
    elif a.ndim == 3 and a.shape[2] in (2, 3, 4):
        channels = a.shape[2]
        color_type = {2: 4, 3: 2, 4: 6}[channels]
    else:
        raise ValueError(f"unsupported array shape {a.shape}")
    h, w = a.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    bpp = channels
    flat = a.reshape(h, w * channels)
    if isinstance(filters, int):
        ftypes = [filters] * h
    elif filters == "auto":
        ftypes = None
    else:
        ftypes = list(filters)
        if len(ftypes) != h:
            raise ValueError("per-row filter list length != height")
    prev = np.zeros(w * channels, dtype=np.uint8)
    lines = []
    for y in range(h):
        row = flat[y]
        if ftypes is None:
            best, best_cost = None, None
            for ft in range(5):
                cand = _filter_row(ft, row, prev, bpp)
                # minimize sum of |signed byte| — the libpng heuristic
                cost = int(
                    np.minimum(cand.astype(np.int64), 256 - cand).sum()
                )
                if best_cost is None or cost < best_cost:
                    best, best_cost, best_ft = cand, cost, ft
            lines.append(bytes([best_ft]) + best.tobytes())
        else:
            ft = ftypes[y]
            lines.append(
                bytes([ft]) + _filter_row(ft, row, prev, bpp).tobytes()
            )
        prev = row
    raw = b"".join(lines)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    comp = zlib.compress(raw, compress_level)
    # split IDAT at 8 KiB so multi-IDAT reassembly is exercised routinely
    idats = b"".join(
        _chunk(b"IDAT", comp[i : i + 8192])
        for i in range(0, len(comp), 8192)
    ) or _chunk(b"IDAT", b"")
    return (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + idats
        + _chunk(b"IEND", b"")
    )


def write_png(path: str, arr: np.ndarray, **kw) -> None:
    """Fixture twin of sources/ingest.write_tiff: a REAL file any PNG
    tool can open."""
    with open(path, "wb") as f:
        f.write(encode_png(arr, **kw))


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def _unfilter(
    raw: bytes, h: int, rowbytes: int, bpp: int
) -> np.ndarray:
    """Invert the per-scanline filters.  Filters 0/2 are pure wrap-add
    (vectorized), 1 is a per-lane cumsum mod 256 (vectorized), 3/4 carry
    a left dependency (per-pixel loop over bpp-wide lanes)."""
    if len(raw) != h * (1 + rowbytes):
        raise ValueError(
            f"bad PNG pixel stream: {len(raw)} bytes != "
            f"{h}*(1+{rowbytes})"
        )
    src = np.frombuffer(raw, dtype=np.uint8).reshape(h, 1 + rowbytes)
    ftypes = src[:, 0]
    data = src[:, 1:]
    out = np.zeros((h, rowbytes), dtype=np.uint8)
    prev = np.zeros(rowbytes, dtype=np.uint8)
    n_pix = rowbytes // bpp
    for y in range(h):
        ft, row = int(ftypes[y]), data[y]
        if ft == 0:
            rec = row.copy()
        elif ft == 1:
            # recon[i] = raw[i] + recon[i-bpp]  ⇒  per-lane cumsum mod 256
            lanes = row.reshape(n_pix, bpp).astype(np.int64)
            rec = (
                np.cumsum(lanes, axis=0) % 256
            ).astype(np.uint8).reshape(rowbytes)
        elif ft == 2:
            rec = row + prev  # uint8 add wraps mod 256
        elif ft == 3:
            rec = np.empty(rowbytes, dtype=np.uint8)
            up = prev.astype(np.int64)
            left = np.zeros(bpp, dtype=np.int64)
            r64 = row.astype(np.int64)
            for i in range(n_pix):
                s = slice(i * bpp, (i + 1) * bpp)
                left = (r64[s] + ((left + up[s]) >> 1)) % 256
                rec[s] = left
        elif ft == 4:
            rec = np.empty(rowbytes, dtype=np.uint8)
            up = prev.astype(np.int64)
            upleft = np.zeros(rowbytes, dtype=np.int64)
            upleft[bpp:] = up[:-bpp]
            left = np.zeros(bpp, dtype=np.int64)
            r64 = row.astype(np.int64)
            for i in range(n_pix):
                s = slice(i * bpp, (i + 1) * bpp)
                u, ul = up[s], upleft[s]
                p = left + u - ul
                pa, pb, pc = np.abs(p - left), np.abs(p - u), np.abs(p - ul)
                pred = np.where(
                    (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, u, ul)
                )
                left = (r64[s] + pred) % 256
                rec[s] = left
        else:
            raise ValueError(f"bad PNG filter type {ft} at row {y}")
        out[y] = rec
        prev = rec
    return out


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → uint8 array: (H, W) for grayscale/palette-gray, else
    (H, W, channels).  Critical-chunk decode with CRC verification;
    multi-IDAT reassembled; ancillary chunks skipped."""
    if not is_png(data):
        raise ValueError("not a PNG: bad signature")
    pos, n = 8, len(data)
    ihdr = None
    plte: np.ndarray | None = None
    idat = []
    while pos + 8 <= n:
        (ln,) = struct.unpack_from(">I", data, pos)
        typ = data[pos + 4 : pos + 8]
        if pos + 12 + ln > n:
            raise ValueError("truncated PNG chunk")
        payload = data[pos + 8 : pos + 8 + ln]
        (crc,) = struct.unpack_from(">I", data, pos + 8 + ln)
        if zlib.crc32(typ + payload) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG CRC mismatch in {typ!r}")
        if typ == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", payload)
        elif typ == b"PLTE":
            if ln % 3:
                raise ValueError("bad PLTE length")
            plte = np.frombuffer(payload, dtype=np.uint8).reshape(-1, 3)
        elif typ == b"IDAT":
            idat.append(payload)
        elif typ == b"IEND":
            break
        pos += 12 + ln
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, ctype, comp, filt, inter = ihdr
    if comp != 0 or filt != 0:
        raise ValueError("bad IHDR compression/filter method")
    if inter not in (0, 1):
        raise ValueError(f"bad IHDR interlace method {inter}")
    if ctype not in _CHANNELS:
        raise ValueError(f"bad color type {ctype}")
    channels = _CHANNELS[ctype]
    if depth == 8:
        pass
    elif depth == 16 and ctype in (0, 2, 4, 6):
        pass  # decoded to 8-bit by taking the high byte (see below)
    elif depth == 1 and ctype in (0, 3):
        pass
    else:
        raise ValueError(
            f"unsupported bit depth {depth} for color type {ctype}"
        )
    raw = zlib.decompress(b"".join(idat))
    bpp = {8: channels, 16: channels * 2, 1: 1}[depth]

    def rowbytes_for(pw: int) -> int:
        if depth == 1:
            return (pw + 7) // 8
        return pw * bpp

    def decode_sub(buf: bytes, pw: int, ph: int) -> np.ndarray:
        """Unfilter + sample-unpack one (sub-)image to (ph, pw, channels)
        uint8.  16-bit samples keep the big-endian HIGH byte — the
        standard 16→8 downsample (value >> 8); depth-1 unpacks bits."""
        px = _unfilter(buf, ph, rowbytes_for(pw), bpp)
        if depth == 8:
            return px.reshape(ph, pw, channels)
        if depth == 16:
            return px.reshape(ph, pw, channels, 2)[:, :, :, 0].copy()
        bits = np.unpackbits(px, axis=1)[:, :pw]
        return (
            bits[:, :, None]
            if ctype == 3
            else (bits * 255).astype(np.uint8)[:, :, None]
        )

    if inter == 0:
        img = decode_sub(raw, w, h)  # _unfilter checks the byte count
    else:
        # Adam7: seven independently-filtered sub-images, scattered back
        # on the (x0, y0, dx, dy) sampling grids of PNG §8.2
        img = np.zeros((h, w, channels), dtype=np.uint8)
        pos = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            nb = ph * (1 + rowbytes_for(pw))
            img[y0::dy, x0::dx] = decode_sub(raw[pos : pos + nb], pw, ph)
            pos += nb
        if pos != len(raw):
            raise ValueError("bad Adam7 pixel stream length")
    if ctype == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        idx = img[:, :, 0]
        if int(idx.max(initial=0)) >= len(plte):
            raise ValueError("palette index out of range")
        return plte[idx]  # (H, W, 3)
    if channels == 1:
        return img[:, :, 0]
    return img


# ---------------------------------------------------------------------------
# grayscale + resample helpers (the seam's downstream consumers)
# ---------------------------------------------------------------------------

#: integer Rec.601 luma weights ×1024 — exact, no float threshold drift
_LUMA_W = (306, 601, 117)


def to_gray(img: np.ndarray) -> np.ndarray:
    """Any decode_png output → 2-D uint8 grayscale (integer Rec.601
    luma; alpha ignored — the reference composites on white only at
    export, not at analysis time)."""
    if img.ndim == 2:
        return img
    c = img.shape[2]
    if c == 2:  # gray + alpha
        return img[:, :, 0]
    r, g, b = (img[:, :, i].astype(np.int64) for i in range(3))
    return (
        (r * _LUMA_W[0] + g * _LUMA_W[1] + b * _LUMA_W[2] + 512) >> 10
    ).astype(np.uint8)


def box_resample(gray: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Exact integer box-average resample of a 2-D uint8 grid to
    (out_h, out_w) — each output cell is the rounded mean of its source
    box (PIL's ``Image.resize(..., BOX)`` moral).  Vectorized with a
    2-D cumulative sum; deterministic across platforms."""
    h, w = gray.shape
    if out_w <= 0 or out_h <= 0:
        raise ValueError("bad output size")
    cs = np.zeros((h + 1, w + 1), dtype=np.int64)
    cs[1:, 1:] = np.cumsum(np.cumsum(gray.astype(np.int64), 0), 1)
    ys = (np.arange(out_h + 1) * h) // out_h
    xs = (np.arange(out_w + 1) * w) // out_w
    sums = (
        cs[np.ix_(ys[1:], xs[1:])]
        - cs[np.ix_(ys[:-1], xs[1:])]
        - cs[np.ix_(ys[1:], xs[:-1])]
        + cs[np.ix_(ys[:-1], xs[:-1])]
    )
    areas = np.outer(ys[1:] - ys[:-1], xs[1:] - xs[:-1])
    if (areas == 0).any():
        raise ValueError(
            f"box_resample cannot upscale {gray.shape} -> "
            f"({out_h}, {out_w}); use repeat-upscale upstream"
        )
    return ((sums + areas // 2) // areas).astype(np.uint8)


def resample_image(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """box_resample generalized to multi-channel decode_png output:
    each channel resampled independently (exact integer box means)."""
    if img.ndim == 2:
        return box_resample(img, out_w, out_h)
    return np.stack(
        [
            box_resample(img[:, :, c], out_w, out_h)
            for c in range(img.shape[2])
        ],
        axis=2,
    )


def grid8(gray: np.ndarray) -> np.ndarray:
    """8×8 box-average grid of a grayscale page — the aHash input.
    Images smaller than 8px on a side are repeat-upscaled first (exact,
    deterministic) so the box means stay well-defined."""
    h, w = gray.shape
    if h < 8 or w < 8:
        gray = np.repeat(
            np.repeat(gray, -(-8 // h), axis=0), -(-8 // w), axis=1
        )
    return box_resample(gray, 8, 8)
