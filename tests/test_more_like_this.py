"""more_like_this (operators/search.py): term-selection and retrieval
semantics on a planted corpus — rare shared terms dominate selection,
topically-similar docs outrank dissimilar ones, the seed never appears
in its own results, and the optional max_doc_freq cut drops ubiquitous
terms.

The cross-engine gate is the driver parity harness (``more_like_this``
twin); these tests pin the semantics.
"""

from __future__ import annotations

from ocr_spark.operators.search import more_like_this

# Doc 0 (seed) is about "zebra quagga savanna"; docs 1-2 share those rare
# terms; docs 3-5 share only the ubiquitous filler "the data".
CORPUS = [
    (0, "the data zebra quagga savanna zebra"),
    (1, "the data zebra savanna grazing"),
    (2, "the data quagga herd zebra"),
    (3, "the data ledger audit tax"),
    (4, "the data ledger tax audit"),
    (5, "the data parquet shuffle"),
]


def _df(spark):
    return spark.createDataFrame(CORPUS, "doc_id bigint, text string")


def test_similar_docs_rank_first_and_seed_excluded(spark):
    got = more_like_this(_df(spark), 0, max_terms=4, top_n=10).collect()
    ids = [r.doc_id for r in got]
    assert 0 not in ids
    # Both zebra/quagga/savanna sharers beat every filler-only doc.
    assert set(ids[:2]) == {1, 2}
    scores = [r.score_micro for r in got]
    assert scores == sorted(scores, reverse=True)


def test_max_doc_freq_cut_drops_ubiquitous_terms(spark):
    # 'the'/'data' appear in all 6 docs; with max_doc_freq=5 they cannot
    # be selected, so filler-only docs score zero hits and vanish.
    got = more_like_this(
        _df(spark), 0, max_terms=8, top_n=10, max_doc_freq=5
    ).collect()
    assert {r.doc_id for r in got} == {1, 2}


def test_without_cut_filler_docs_still_trail(spark):
    got = more_like_this(_df(spark), 0, max_terms=8, top_n=10).collect()
    by_id = {r.doc_id: r for r in got}
    assert by_id[1].score_micro > by_id[3].score_micro
    assert by_id[2].score_micro > by_id[5].score_micro
    # Filler docs hit only the common terms.
    assert by_id[3].n_hit_terms < by_id[1].n_hit_terms
