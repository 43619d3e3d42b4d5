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
