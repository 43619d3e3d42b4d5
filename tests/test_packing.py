"""pack_sequences (operators/packing.py) vs a driver-side brute-force
model: concatenate each source's normalized token stream in the
deterministic hash order, chunk to seq_len, compare every window exactly.
"""

from __future__ import annotations

import hashlib
import re

from ocr_spark.operators.packing import pack_sequences

PUNCT = "«»“”.,;:!?()[]{}\"'"


def _norm_tokens(text: str) -> list[str]:
    toks = [
        w.lower().translate(str.maketrans("", "", PUNCT))
        for w in re.split(r"\s+", text.strip())
    ]
    return [t for t in toks if t]


def _key(doc_id: int, seed: int = 42) -> str:
    return hashlib.md5(f"{seed}|{doc_id}".encode()).hexdigest()[:12]


def _brute_pack(rows, seq_len, seed=42):
    by_source: dict[str, list] = {}
    for doc_id, source, text in rows:
        by_source.setdefault(source, []).append((doc_id, text))
    out = {}
    for source, docs in by_source.items():
        docs.sort(key=lambda d: (_key(d[0], seed), d[0]))
        stream: list[str] = []
        for _, text in docs:
            stream.extend(_norm_tokens(text))
        for w in range(0, len(stream), seq_len):
            piece = stream[w : w + seq_len]
            out[(source, w // seq_len)] = (len(piece), " ".join(piece))
    return out


ROWS = [
    (1, "a", "alpha beta gamma delta epsilon zeta"),
    (2, "a", "eta theta iota kappa"),
    (3, "a", "lambda mu nu xi omicron pi rho sigma tau upsilon"),
    (4, "b", "one two three"),
    (5, "b", "four five six seven eight nine ten eleven twelve"),
    (6, "b", ""),  # zero tokens — contributes nothing
    (7, "b", "!!! ..."),  # all tokens normalize to empty
]


def test_pack_matches_bruteforce(spark):
    df = spark.createDataFrame(ROWS, "doc_id bigint, source string, text string")
    for seq_len in (4, 7, 64):
        got = {
            (r["source"], r["win_id"]): (r["n_tokens"], r["text"])
            for r in pack_sequences(df, seq_len=seq_len).collect()
        }
        exp = _brute_pack(ROWS, seq_len)
        assert got == exp, f"seq_len={seq_len}"


def test_pack_full_windows_except_tail(spark):
    df = spark.createDataFrame(ROWS, "doc_id bigint, source string, text string")
    rows = pack_sequences(df, seq_len=4).collect()
    by_source: dict[str, list] = {}
    for r in rows:
        by_source.setdefault(r["source"], []).append(r)
    for source, wins in by_source.items():
        wins.sort(key=lambda r: r["win_id"])
        # contiguous window ids from 0
        assert [w["win_id"] for w in wins] == list(range(len(wins)))
        # every window except the last is exactly full
        assert all(w["n_tokens"] == 4 for w in wins[:-1])
        # token conservation: sum of window sizes == total stream length
        total = sum(
            len(_norm_tokens(t)) for d, s, t in ROWS if s == source
        )
        assert sum(w["n_tokens"] for w in wins) == total


# --- sliding_chunks ---------------------------------------------------------

from ocr_spark.operators.packing import sliding_chunks  # noqa: E402


def _brute_chunks(text: str, size: int, stride: int):
    toks = _norm_tokens(text)
    out = []
    s = 0
    while s < len(toks):
        piece = toks[s : s + size]
        out.append((s // stride, len(piece), " ".join(piece)))
        s += stride
    return out


def test_sliding_chunks_matches_brute(spark):
    rows = [
        (1, "a b c d e f g h i j"),     # 10 tokens
        (2, "one two three"),            # fits one window
        (3, "   "),                      # empty after normalize
        (4, " ".join(f"t{i}" for i in range(17))),  # exact multiple edges
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    for size, stride in [(4, 3), (4, 4), (16, 12), (5, 2)]:
        got = {
            (r.doc_id, r.chunk_id, r.n_tokens, r.text)
            for r in sliding_chunks(df, size=size, stride=stride).collect()
        }
        exp = {
            (doc_id, cid, n, t)
            for doc_id, text in rows
            for cid, n, t in _brute_chunks(text, size, stride)
        }
        assert got == exp, (size, stride)


def test_sliding_chunks_overlap_reconstructs_document(spark):
    text = " ".join(f"w{i}" for i in range(30))
    df = spark.createDataFrame([(1, text)], "doc_id int, text string")
    rows = sorted(
        sliding_chunks(df, size=8, stride=8).collect(),
        key=lambda r: r.chunk_id,
    )
    # stride == size → non-overlapping chunks concatenate to the doc
    assert " ".join(r.text for r in rows) == text


def test_sliding_chunks_plan_has_no_exchange(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id int, text string")
    plan = (
        sliding_chunks(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_sliding_chunks_rejects_bad_stride(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id int, text string")
    import pytest as _pytest

    with _pytest.raises(ValueError):
        sliding_chunks(df, size=4, stride=5)
    with _pytest.raises(ValueError):
        sliding_chunks(df, size=4, stride=0)
