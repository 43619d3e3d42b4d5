"""Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD 2003):
the Spark plan must reproduce an exact driver-side robust-winnowing
model (window min, rightmost tie-break), honor the detection guarantee
(any shared run >= w+k-1 tokens shares a fingerprint), and the overlap
join must apply the boilerplate guard."""

from __future__ import annotations

import hashlib
import random

from ocr_spark.operators.dedup import winnow_fingerprints, winnow_overlap

K, W = 5, 4


def _winnow_model(tokens: list[str], k: int = K, w: int = W) -> set:
    """Robust winnowing over already-normalized tokens: 40-bit md5-prefix
    gram hashes, per-window min with the rightmost-position tie-break."""
    grams = [" ".join(tokens[i : i + k]) for i in range(len(tokens) - k + 1)]
    hs = [
        int(hashlib.md5(g.encode()).hexdigest()[:10], 16) for g in grams
    ]
    out = set()
    for j in range(len(hs) - w + 1):
        m = min(hs[j : j + w])
        p = max(i for i in range(j, j + w) if hs[i] == m)
        out.add((hs[p], p))
    return out


def _tok(rng: random.Random, n: int, vocab: int = 30) -> list[str]:
    # tiny vocab forces repeated grams → exercises the tie-break path
    return [f"w{rng.randrange(vocab)}" for _ in range(n)]


def test_winnow_matches_model(spark):
    rng = random.Random(7)
    docs = [(d, " ".join(_tok(rng, rng.randrange(8, 60)))) for d in range(12)]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    got: dict = {}
    for r in winnow_fingerprints(df, k=K, w=W).collect():
        got.setdefault(r["doc_id"], set()).add((r["fp"], r["pos"]))
    for d, text in docs:
        assert got.get(d, set()) == _winnow_model(text.split()), d


def test_winnow_detection_guarantee(spark):
    """Two docs embedding the same (w+k-1)-token run at different offsets
    must share at least one fingerprint HASH (positions may differ)."""
    rng = random.Random(11)
    run = _tok(rng, W + K - 1, vocab=10**6)  # unique-ish shared run
    a = _tok(rng, 20, vocab=10**6) + run + _tok(rng, 5, vocab=10**6)
    b = run + _tok(rng, 30, vocab=10**6)
    df = spark.createDataFrame(
        [(1, " ".join(a)), (2, " ".join(b))], "doc_id bigint, text string"
    )
    rows = winnow_fingerprints(df, k=K, w=W).collect()
    fps = {1: set(), 2: set()}
    for r in rows:
        fps[r["doc_id"]].add(r["fp"])
    assert fps[1] & fps[2]


def test_winnow_short_doc_empty(spark):
    """Fewer than w grams (< k+w-1 tokens) → no full window → no rows."""
    df = spark.createDataFrame(
        [(1, "a b c d e f g")], "doc_id bigint, text string"
    )  # 7 tokens = k+w-2
    assert winnow_fingerprints(df, k=K, w=W).count() == 0


def test_winnow_overlap_pairs_and_guard(spark):
    rng = random.Random(13)
    run = _tok(rng, 40, vocab=10**6)
    uniq = lambda n: _tok(rng, n, vocab=10**6)  # noqa: E731
    docs = [
        (1, " ".join(uniq(10) + run)),
        (2, " ".join(run + uniq(12))),
        (3, " ".join(uniq(50))),
    ]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    pairs = {
        (r["a"], r["b"]): r["shared"]
        for r in winnow_overlap(df, k=K, w=W, min_shared=2).collect()
    }
    assert set(pairs) == {(1, 2)} and pairs[(1, 2)] >= 2
    # boilerplate guard: a run shared by ALL docs with max_docs=2 → no
    # fingerprint survives → no pairs at all
    docs3 = [(d, " ".join(run)) for d in (1, 2, 3)]
    df3 = spark.createDataFrame(docs3, "doc_id bigint, text string")
    assert winnow_overlap(df3, k=K, w=W, max_docs=2).count() == 0
