"""Multimodal interleaved packing (operators/packing.py pack_interleaved)
against a pure-Python packer with the same md5 stream order."""

import hashlib

from pyspark.sql import functions as F

from ocr_spark.operators.packing import pack_interleaved

# (doc_id, [(kind, text, media_ref)...])  — already-extracted span streams
DOCS = [
    ("d1", [("text", "alpha", None), ("media_ref", None, "img1.png"),
            ("text", "beta", None)]),
    ("d2", [("text", "gamma", None)] * 5),
    ("d3", [("media_ref", None, "img2.png"), ("media_ref", None, "img3.png")]),
    ("d4", []),  # zero spans → contributes nothing
    ("d5", [("text", f"w{i}", None) for i in range(9)]),
]
L, G = 4, 4


def _key(doc_id):
    return hashlib.md5(f"42|{doc_id}".encode()).hexdigest()[:12]


def _grp(doc_id):
    return int(_key(doc_id), 16) % G


def _brute():
    streams = {}
    for doc_id, spans in DOCS:
        if not spans:
            continue
        units = [
            (t if k == "text" else "<media>", r) for k, t, r in spans
        ]
        streams.setdefault(_grp(doc_id), []).append((_key(doc_id), doc_id, units))
    out = {}
    for g, docs in streams.items():
        stream = []
        for _, _, units in sorted(docs):
            stream.extend(units)
        for w in range(0, len(stream), L):
            win = stream[w : w + L]
            refs = [r for _, r in win if r is not None]
            out[(g, w // L)] = (
                len(win),
                len(refs),
                " ".join(t for t, _ in win),
                " ".join(refs),
            )
    return out


def test_pack_interleaved_matches_bruteforce(spark):
    rows = [
        (
            d,
            [
                {"kind": k, "text": t, "media_ref": r, "offset": i}
                for i, (k, t, r) in enumerate(spans)
            ],
        )
        for d, spans in DOCS
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )
    got = {
        (r["grp"], r["win_id"]): (
            r["n_tokens"], r["n_media"], r["text"], r["media_refs"]
        )
        for r in pack_interleaved(df, seq_len=L, n_groups=G).collect()
    }
    assert got == _brute()
    # repartition invariance
    again = {
        (r["grp"], r["win_id"]): (
            r["n_tokens"], r["n_media"], r["text"], r["media_refs"]
        )
        for r in pack_interleaved(
            df.repartition(3), seq_len=L, n_groups=G
        ).collect()
    }
    assert again == got


def test_pack_interleaved_conserves_units(spark):
    rows = [
        (
            d,
            [
                {"kind": k, "text": t, "media_ref": r, "offset": i}
                for i, (k, t, r) in enumerate(spans)
            ],
        )
        for d, spans in DOCS
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )
    packed = pack_interleaved(df, seq_len=L, n_groups=G)
    total_units = sum(len(s) for _, s in DOCS)
    total_media = sum(
        1 for _, s in DOCS for k, _, _ in s if k == "media_ref"
    )
    agg = packed.agg(
        F.sum("n_tokens").alias("t"), F.sum("n_media").alias("m")
    ).collect()[0]
    assert (agg["t"], agg["m"]) == (total_units, total_media)
    # every full window has exactly L tokens; at most one short window
    # per group
    short = packed.where(F.col("n_tokens") < L).groupBy("grp").count()
    assert all(r["count"] == 1 for r in short.collect())
