"""postings_codec (operators/index.py): exact equality against a
pure-Python block-delta + vbyte model, block restart behavior, the
dense-postings compression property, and the two-bounded-shuffle /
no-window plan.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_spark.operators.index import postings_codec


def _vbyte_len(v: int) -> int:
    for k in range(1, 9):
        if v < 1 << (7 * k):
            return k
    return 9


def _model(doc_words: dict[int, list[str]], block: int):
    posts: dict[str, set[int]] = {}
    for d, ws in doc_words.items():
        for w in ws:
            posts.setdefault(w, set()).add(d)
    out = {}
    for w, ds in posts.items():
        by_block: dict[int, list[int]] = {}
        for d in sorted(ds):
            by_block.setdefault(d // block, []).append(d)
        vb = 0
        for ids in by_block.values():
            vb += _vbyte_len(ids[0] + 1)
            vb += sum(_vbyte_len(b - a) for a, b in zip(ids, ids[1:]))
        out[w] = (len(ds), len(by_block), 8 * len(ds), vb)
    return out


def test_exact_model_equality_with_block_restarts(spark):
    # Plain lowercase tokens so normalization is whitespace split; ids
    # straddle the block=4 grid to exercise restart points.
    doc_words = {
        0: ["alpha", "beta"],
        1: ["alpha"],
        3: ["alpha", "gamma"],
        4: ["alpha", "beta"],  # new block: absolute restart
        7: ["alpha"],
        9: ["alpha", "gamma"],
    }
    df = spark.createDataFrame(
        [(d, " ".join(ws)) for d, ws in doc_words.items()],
        "doc_id bigint, text string",
    )
    got = {
        r.word: (r.df, r.n_blocks, r.raw_bytes, r.vbyte_bytes)
        for r in postings_codec(df, block=4).collect()
    }
    assert got == _model(doc_words, 4)


def test_dense_postings_compress_hardest(spark):
    # A stopword in every doc: gaps are all 1 → 1 byte each, vs 8 raw.
    df = spark.createDataFrame(
        [(i, "the rare" if i == 500 else "the") for i in range(1000)],
        "doc_id bigint, text string",
    )
    got = {
        r.word: (r.df, r.raw_bytes, r.vbyte_bytes)
        for r in postings_codec(df, block=128).collect()
    }
    df_the, raw_the, vb_the = got["the"]
    assert df_the == 1000 and raw_the == 8000
    # 8 blocks × (restart ≤ 2 bytes) + 992 unit gaps × 1 byte
    assert vb_the < raw_the / 6
    assert got["rare"][2] >= 2  # a lone mid-corpus posting: absolute vbyte


def test_plan_two_bounded_shuffles_no_window(spark):
    df = spark.createDataFrame(
        [(1, "a b"), (2, "a")], "doc_id bigint, text string"
    )
    plan = (
        postings_codec(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in plan
    assert "SinglePartition" not in plan
    assert plan.count("Exchange") <= 4
