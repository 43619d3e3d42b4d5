"""Composed web-curation job (jobs/web_curate.py): each stage provably
removes its planted victim, retention is monotone, the near-dup keep is
quality-aware (highest n_chars survives), and split assignment is
leakage-safe by construction (keyed on the cluster representative).

The end-to-end value hashes are gated by the DuckDB mega-twin in
tests/test_driver_contract.py; this file pins the per-stage semantics on
a corpus where every stage has exactly one planted casualty.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ocr_spark.jobs.web_curate import curate_web

# near-dup donor for the 7/8 pair: long enough to shingle, no repetition
_NEAR = (
    "the quick brown fox jumps over a lazy dog while seventeen green "
    "parrots debate quarterly tax policy near an abandoned lighthouse "
    "whose keeper once catalogued every passing ship by hull color and "
    "tonnage for the maritime registry office"
)


def _distinct(tag: str) -> str:
    """A per-doc text with no trigram shared across docs (every trigram
    carries the doc tag), so curate_web's threshold=0.0 LSH pass can
    never band two different docs together."""
    return " ".join(f"{tag}{i}" for i in range(30))


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        # URL-dup pair: 1 and 2 normalize to the same URL; min id (1) keeps
        (1, "https://good.com/a?utm_source=x", _distinct("alpha"), "en"),
        (2, "HTTPS://good.com/a", _distinct("omega"), "en"),
        # bad.com is majority non-en -> whole domain filtered at stage 2
        (3, "https://bad.com/p1", _distinct("beta"), "xx"),
        (4, "https://bad.com/p2", _distinct("gamma"), "xx"),
        (5, "https://bad.com/p3", _distinct("delta"), "en"),
        # repetitive doc: one trigram repeated -> flagged at stage 3
        (6, "https://good.com/rep", "spam ham " * 40, "en"),
        # near-dup pair: 7 is 8 minus its last word -> 8 (more chars)
        # is the canonical keeper, 7 dies at stage 4
        (7, "https://good.com/n1", _NEAR, "en"),
        (8, "https://good.com/n2", _NEAR + " postscript", "en"),
        # independent survivor
        (9, "https://good.com/solo", _distinct("solo"), "en"),
    ]
    return spark.createDataFrame(
        [(i, u, t, lang, len(t)) for i, u, t, lang in rows],
        "doc_id bigint, url string, text string, lang string, n_chars bigint",
    )


def test_web_curation_stages(spark, corpus):
    registry: list = []
    out, stats = curate_web(corpus, cache_registry=registry)
    rows = {r["doc_id"]: r for r in out.collect()}
    try:
        # retention monotone non-increasing through the stage order
        order = ["input", "after_url_dedup", "after_domain_filter",
                 "after_repetition", "after_neardup_keep"]
        vals = [stats[k] for k in order]
        assert vals == sorted(vals, reverse=True), stats
        assert stats["input"] == 9
        # stage 1: URL-dup loser 2 died, min-id 1 survived
        assert stats["after_url_dedup"] == 8
        assert 1 in rows and 2 not in rows
        # stage 2: bad.com (1/3 en < 0.3? no — exactly 1/3 >= 0.3 keeps)
        # en_frac(bad.com) = 1/3 = 0.333333 >= 0.3, so bad.com SURVIVES
        # the default prior; tighten it and re-run to prove the stage
        assert stats["after_domain_filter"] == 8
        # stage 3: the repetitive doc died
        assert 6 not in rows
        assert stats["after_repetition"] == stats["after_domain_filter"] - 1
        # stage 4: near-dup loser 7 died; higher-n_chars 8 kept
        assert 7 not in rows and 8 in rows
        assert stats["after_neardup_keep"] == stats["after_repetition"] - 1
        # survivors: splits valid, cluster keeper keyed on component min
        assert set(rows) == {1, 3, 4, 5, 8, 9}
        assert all(r["split"] in ("train", "val", "test")
                   for r in rows.values())
        assert rows[8]["component"] == 7  # representative = min member id
        assert rows[9]["component"] == 9  # singleton keys on itself
    finally:
        for df in registry:
            df.unpersist()


def test_web_curation_domain_prior_bites(spark, corpus):
    """With the prior raised past 1/3, the bad.com domain (en_frac
    0.333…) is dropped wholesale — including its en-language doc 5,
    which is the point of a domain-level prior."""
    registry: list = []
    out, stats = curate_web(corpus, min_lang_frac=0.5,
                            cache_registry=registry)
    ids = {r["doc_id"] for r in out.collect()}
    try:
        assert stats["after_domain_filter"] == stats["after_url_dedup"] - 3
        assert ids & {3, 4, 5} == set()
        assert {1, 8, 9} <= ids
    finally:
        for df in registry:
            df.unpersist()


def test_web_curation_split_is_leakage_safe(spark, corpus):
    """Force the near-dup pair to BOTH survive (jaccard threshold above
    their similarity is impossible — instead keep them by making the
    keep-set moot: identical n_chars would still drop one; so assert the
    defense on the kept doc directly: its split equals the split of its
    cluster representative key, i.e. re-running with the loser as a solo
    doc lands it in the same split its cluster got)."""
    registry: list = []
    out, _ = curate_web(corpus, cache_registry=registry)
    kept = {r["doc_id"]: r for r in out.collect()}
    try:
        # doc 8's split is keyed on component 7 — by construction any
        # member of that cluster, had it been kept, would share it.
        from ocr_spark.operators.sampling import leakage_safe_split

        solo = corpus.where(F.col("doc_id") == 7).select("doc_id")
        clusters = spark.createDataFrame(
            [(7, 7)], "doc_id bigint, component bigint"
        )
        twin = leakage_safe_split(solo, clusters).collect()[0]
        assert twin["split"] == kept[8]["split"]
    finally:
        for df in registry:
            df.unpersist()
