"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference has no streaming (SURVEY.md §2.11); this is the engine's
"custom stateful operator" surface for the continuous-ingest mode of the
pipeline: **streaming first-occurrence dedup** — emit a document only the
first time its content fingerprint is seen, keeping one tiny state cell per
fingerprint group.

Scale design: state is keyed by fingerprint (groupBy shuffle on the 32-byte
key — uniform, skew-free); each state cell stores only the first-seen
doc_id + count, so state size is O(distinct fingerprints) regardless of
document sizes; a processing-time timeout (``state_ttl_minutes``) bounds
state for unbounded streams (near-dup windows in web crawl dedup are
typically bounded in time).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "fp string, doc_id string, dup_count bigint"
STATE_SCHEMA = "first_doc_id string, n_seen bigint"


def _dedup_fn(
    key: Any,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (fp,) = key
    rows = pd.concat(list(pdfs), ignore_index=True)
    rows = rows.sort_values("doc_id", kind="stable")
    if state.exists:
        first_doc, n_seen = state.get
        emit = rows.iloc[0:0]
    else:
        first_doc = rows.iloc[0]["doc_id"]
        n_seen = 0
        emit = rows.iloc[[0]]
    n_seen += len(rows)
    state.update((first_doc, n_seen))
    if emit.empty:
        yield pd.DataFrame(columns=["fp", "doc_id", "dup_count"])
    else:
        yield pd.DataFrame(
            {"fp": [fp], "doc_id": [first_doc], "dup_count": [n_seen]}
        )


def streaming_dedup(
    keyed: DataFrame, state_ttl_minutes: int | None = None
) -> DataFrame:
    """(fp, doc_id) stream → first occurrence per fingerprint.

    ``keyed`` must have columns ``fp string, doc_id string`` (use
    functions.text.doc_fingerprint upstream).  Append output mode.
    """
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if state_ttl_minutes
        else GroupStateTimeout.NoTimeout
    )
    return keyed.groupBy("fp").applyInPandasWithState(
        _dedup_fn,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )


# ---------------------------------------------------------------------------
# S7 streaming form: live chunked-upload assembly
# ---------------------------------------------------------------------------

UPLOAD_OUT = (
    "file_id string, total_count int, n_chunks int, n_bytes bigint, "
    "assembly_md5 string"
)
UPLOAD_STATE = "total_count int, counters array<int>, datas array<binary>"


_EMPTY_UPLOAD_OUT = pd.DataFrame(
    columns=[
        "file_id", "total_count", "n_chunks", "n_bytes", "assembly_md5",
    ]
)


def _assembly_fn(
    key: Any,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    ttl_ms: int | None = None,
) -> Iterator[pd.DataFrame]:
    """Accumulate chunks per file across micro-batches; emit exactly ONE
    completion row when every counter 1..total_count has arrived, then
    drop the state.  Overwrite semantics and the completion rule mirror
    the batch operator (sources/upload.chunk_assembly) exactly — gated
    by the stream==batch equivalence test.  With a TTL configured, the
    processing-time timeout is re-armed on every state update and a
    timed-out invocation (no input rows) drops the abandoned upload's
    buffered chunks — the reference's temp-folder cleanup cron."""
    import hashlib

    (file_id,) = key
    if state.hasTimedOut:
        # abandoned upload: expire the buffered chunks, emit nothing
        state.remove()
        yield _EMPTY_UPLOAD_OUT
        return
    rows = pd.concat(list(pdfs), ignore_index=True)
    if state.exists:
        total, counters, datas = state.get
        got = {
            int(c): bytes(d) for c, d in zip(counters, datas)
        }
        total = int(total)
    else:
        total, got = None, {}
    for _, r in rows.iterrows():
        t = int(r["total_count"])
        total = t if total is None else max(total, t)
        c, d = int(r["counter"]), bytes(r["data"])
        got[c] = max(got[c], d) if c in got else d  # bytewise-max re-send
    counters = sorted(got)
    done = (
        total is not None
        and len(counters) == total
        and counters
        and counters[0] == 1
        and counters[-1] == total
    )
    if done:
        blob = b"".join(got[c] for c in counters)
        state.remove()
        yield pd.DataFrame(
            {
                "file_id": [file_id],
                "total_count": [total],
                "n_chunks": [len(counters)],
                "n_bytes": [len(blob)],
                "assembly_md5": [hashlib.md5(blob).hexdigest()],
            }
        )
    else:
        state.update((total, counters, [got[c] for c in counters]))
        if ttl_ms:
            state.setTimeoutDuration(ttl_ms)
        yield _EMPTY_UPLOAD_OUT


def streaming_chunk_assembly(
    chunks: DataFrame, state_ttl_minutes: int | None = None
) -> DataFrame:
    """S7's live form — the reference accepts upload chunks one POST at
    a time and joins them when the last arrives (app.py:676-760); here
    chunks arrive as a stream and ``applyInPandasWithState`` keeps one
    state cell per in-flight file (the chunk payloads — an upload
    assembler buffers by definition, like the reference's temp chunk
    folder; ``state_ttl_minutes`` expires abandoned uploads the way the
    reference's temp cleanup does).  Append mode: one completion row
    per file, ever.  Input: ``file_id string, counter int, total_count
    int, data binary``."""
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if state_ttl_minutes
        else GroupStateTimeout.NoTimeout
    )
    if state_ttl_minutes:
        ttl_ms = state_ttl_minutes * 60 * 1000

        def fn(key, pdfs, state):
            return _assembly_fn(key, pdfs, state, ttl_ms=ttl_ms)

    else:
        fn = _assembly_fn
    return chunks.groupBy("file_id").applyInPandasWithState(
        fn,
        outputStructType=UPLOAD_OUT,
        stateStructType=UPLOAD_STATE,
        outputMode="append",
        timeoutConf=timeout,
    )
