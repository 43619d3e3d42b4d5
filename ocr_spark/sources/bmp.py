"""Pure-Python BMP decoder — uncompressed BI_RGB DIBs (the format's
overwhelmingly common case on disk).

Extends the real-pixel family (sources/png.py, sources/jpeg.py) to the
third header family sources/imagemeta.py already measures: 8-bit
paletted, 24-bit BGR and 32-bit BGRA pixels, 4-byte-aligned rows,
bottom-up (positive height) or top-down (negative) row order.
RLE/bitfield compression and other depths raise ValueError — kernels
degrade via sources/imagecodec.sniff_decode.
"""

from __future__ import annotations

import struct

import numpy as np


def is_bmp(data: bytes) -> bool:
    return len(data) >= 26 and data[:2] == b"BM"


def decode_bmp(data: bytes) -> np.ndarray:
    """BMP bytes → uint8 pixels: (H, W, 3) RGB for 24/32-bit and
    paletted 8-bit, top-down row order regardless of the file's."""
    if not is_bmp(data):
        raise ValueError("not a BMP: missing BM signature")
    try:
        (pix_off,) = struct.unpack_from("<I", data, 10)
        (hdr,) = struct.unpack_from("<I", data, 14)
        if hdr < 40:
            raise ValueError(f"unsupported BMP header size {hdr}")
        w, h = struct.unpack_from("<ii", data, 18)
        planes, bpp = struct.unpack_from("<HH", data, 26)
        (comp,) = struct.unpack_from("<I", data, 30)
        (clr_used,) = struct.unpack_from("<I", data, 46)
    except struct.error as e:
        raise ValueError(f"truncated BMP header: {e}") from e
    if comp != 0:
        raise ValueError(f"unsupported BMP compression {comp}")
    if planes != 1:
        raise ValueError(f"bad BMP planes {planes}")
    top_down = h < 0
    h = abs(h)
    if w <= 0 or h == 0:
        raise ValueError("bad BMP dimensions")
    if bpp == 8:
        n_colors = clr_used or 256
        pal_off = 14 + hdr
        pal = np.frombuffer(
            data, np.uint8, count=n_colors * 4, offset=pal_off
        ).reshape(n_colors, 4)[:, [2, 1, 0]]  # BGRX → RGB
        row_bytes = (w + 3) & ~3
        need = pix_off + row_bytes * h
        if need > len(data):
            raise ValueError("truncated BMP pixel data")
        rows = np.frombuffer(
            data, np.uint8, count=row_bytes * h, offset=pix_off
        ).reshape(h, row_bytes)[:, :w]
        if int(rows.max(initial=0)) >= n_colors:
            raise ValueError("BMP palette index out of range")
        img = pal[rows]
    elif bpp in (24, 32):
        ch = bpp // 8
        row_bytes = (w * ch + 3) & ~3
        if pix_off + row_bytes * h > len(data):
            raise ValueError("truncated BMP pixel data")
        rows = np.frombuffer(
            data, np.uint8, count=row_bytes * h, offset=pix_off
        ).reshape(h, row_bytes)[:, : w * ch].reshape(h, w, ch)
        img = rows[:, :, [2, 1, 0]]  # BGR(A) → RGB, alpha dropped
    else:
        raise ValueError(f"unsupported BMP bit depth {bpp}")
    if not top_down:
        img = img[::-1]
    return np.ascontiguousarray(img)


def encode_bmp(img: np.ndarray, top_down: bool = False) -> bytes:
    """Fixture twin: uint8 (H, W, 3) RGB (or (H, W) gray, written as a
    256-entry grayscale palette) → a BI_RGB BMP any viewer opens."""
    a = np.asarray(img, dtype=np.uint8)
    if a.ndim == 2:
        h, w = a.shape
        row_bytes = (w + 3) & ~3
        pal = b"".join(bytes([v, v, v, 0]) for v in range(256))
        rows = np.zeros((h, row_bytes), np.uint8)
        rows[:, :w] = a
        px = (rows if top_down else rows[::-1]).tobytes()
        body = pal + px
        bpp, pix_off, px_size = 8, 14 + 40 + len(pal), len(px)
    elif a.ndim == 3 and a.shape[2] == 3:
        h, w = a.shape[:2]
        row_bytes = (w * 3 + 3) & ~3
        rows = np.zeros((h, row_bytes), np.uint8)
        rows[:, : w * 3] = a[:, :, [2, 1, 0]].reshape(h, w * 3)
        body = (rows if top_down else rows[::-1]).tobytes()
        bpp, pix_off, px_size = 24, 14 + 40, len(body)
    else:
        raise ValueError(f"unsupported array shape {a.shape}")
    info = struct.pack(
        "<IiiHHIIiiII",
        40, w, -h if top_down else h, 1, bpp, 0, px_size, 2835, 2835,
        256 if bpp == 8 else 0, 0,
    )
    head = b"BM" + struct.pack("<IHHI", pix_off + len(body), 0, 0, pix_off)
    return head + info + body
