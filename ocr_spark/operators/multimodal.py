"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed through Arrow-batched ``mapInPandas``
kernels.

The actual codec work (image decode, resampling, frame sampling) needs
native libraries not present in this container, so the *decode step* is a
deterministic fake behind ``FAKE_DECODE`` / a clearly-marked
``NotImplementedError`` — but everything Spark-side is real and tested:
schemas, batch iteration, partition sizing, UDF signatures, and the
metadata columns downstream operators key on.

This is the Spark landing zone for the reference's media path: cropped
image regions (server/celery_app.py:1062-1081) become ``media(doc_id,
media_ref, content binary, mime, width, height)`` rows; the page rasters
(server/celery_app.py:887-942, 300 DPI pdfium renders) are the same shape
one level up.

Scale design: media bytes never enter a shuffle — every kernel here is a
narrow map; joins against span tables go through the slim ``media_ref``
key column only, with the binary payload left in place (late
materialization).  ``spark.sql.files.maxPartitionBytes`` governs scan
parallelism; Arrow batches are already capped by session.py.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

FAKE_DECODE = True  # container has no image/audio codecs; see module docstring

MEDIA_SCHEMA = (
    "doc_id string, media_ref string, content binary, mime string"
)
FEATURE_SCHEMA = (
    "doc_id string, media_ref string, mime string, n_bytes bigint, "
    "sha1 string, width int, height int, feat array<float>"
)


def _fake_decode(content: bytes) -> tuple[int, int, np.ndarray]:
    """Deterministic fake decoder: derives (width, height, 8-dim feature)
    purely from the bytes, so tests are stable.  A real build swaps this for
    PIL/ffmpeg behind the same signature."""
    if not FAKE_DECODE:
        raise NotImplementedError(
            "real media decode requires PIL/ffmpeg, not present in this container"
        )
    h = hashlib.sha1(content).digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    feat = np.frombuffer(h[:16], dtype=np.uint8)[:8].astype(np.float32) / 255.0
    return width, height, feat


def extract_media_features(media: DataFrame) -> DataFrame:
    """binary content → typed metadata + feature vector, one Arrow-batched
    pass (decode amortized per batch, reference batching moral
    server/src/engines/ocr_tesserocr.py:102-124)."""

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, ref, content, mime in zip(
                pdf["doc_id"], pdf["media_ref"], pdf["content"], pdf["mime"]
            ):
                b = bytes(content) if content is not None else b""
                w, hgt, feat = _fake_decode(b)
                rows.append(
                    (
                        doc_id,
                        ref,
                        mime,
                        len(b),
                        hashlib.sha1(b).hexdigest(),
                        w,
                        hgt,
                        feat.tolist(),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "media_ref", "mime", "n_bytes", "sha1",
                    "width", "height", "feat",
                ],
            )

    return media.mapInPandas(fn, FEATURE_SCHEMA)


def synth_media_for_spans(spans_df: DataFrame) -> DataFrame:
    """Build the media-bytes side table for every ``media_ref`` span:
    deterministic fake PNG-ish payloads (magic header + seeded bytes).
    Data-gen utility for tests/bench — content = f(doc_id, media_ref)."""
    from pyspark.sql import functions as F

    refs = (
        spans_df.select("doc_id", F.explode("spans").alias("s"))
        .where(F.col("s.kind") == "media_ref")
        .select("doc_id", F.col("s.media_ref").alias("media_ref"))
        .distinct()
    )

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        magic = b"\x89PNG\r\n\x1a\n"
        for pdf in it:
            content = [
                magic
                + hashlib.sha256(f"{d}/{r}".encode()).digest()
                + struct.pack("<I", len(r))
                for d, r in zip(pdf["doc_id"], pdf["media_ref"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_ref": pdf["media_ref"],
                    "content": content,
                    "mime": "image/png",
                }
            )

    return refs.mapInPandas(fn, MEDIA_SCHEMA)
