"""The composed WEB-corpus curation pipeline — the crawl-side sibling of
jobs/curate.py (which curates the OCR/extraction side):

    docs+urls → URL-level dedup (normalized-URL keep) →
    domain blocklist (per-domain language prior) →
    repetition quality filter (Gopher analogs) →
    near-dup clusters → quality-aware canonical keep →
    leakage-safe train/val/test split →
    curated table + per-stage retention stats

Stage shapes (scale notes):

1. **URL dedup** — one groupBy on the near-unique normalized URL;
   min-doc-id keep (operators/web.py).
2. **domain filter** — bounded per-domain rollup; prior applied with a
   broadcast anti-join (no extra shuffle).
3. **repetition filter** — zero-shuffle per-row Catalyst
   (operators/quality.py doc_repetition); docs too short to carry a
   trigram signal pass through (no signal ≠ bad).
4. **near-dup canonical keep** — banded MinHash pairs → connected
   components → keep the highest-n_chars copy per cluster
   (operators/graph.py canonical_select); only slim pair/cluster rows
   shuffle.
5. **split** — leakage-safe assignment keyed on the cluster
   representative (operators/sampling.py), so near-dups of a kept doc
   can never contaminate its eval split.

Each stage emits a retention count (one action per stage); the stage-3
survivor set is persisted before the LSH so tokenization/shingling
upstream runs once, the curate.py cache discipline.

Exactness: every stage decision is an exact integer/string comparison or
a round(·,6) ratio shared with the DuckDB twin (`web_curate` in
__spark_entry__.py) — the WHOLE composed pipeline is hash-gated, not
just its pieces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ocr_spark.functions.url import registered_domain, url_host
from ocr_spark.operators.dedup import minhash_lsh_dedup
from ocr_spark.operators.graph import canonical_select, neardup_clusters
from ocr_spark.operators.quality import doc_repetition
from ocr_spark.operators.sampling import leakage_safe_split
from ocr_spark.operators.web import url_dedup


def curate_web(
    docs: DataFrame,
    min_lang_frac: float = 0.3,
    jaccard_threshold: float = 0.0,
    train_frac: float = 0.8,
    val_frac: float = 0.1,
    cache_registry: list | None = None,
) -> tuple[DataFrame, dict[str, int]]:
    """Run the full web pipeline over ``docs`` with columns
    ``doc_id, url, text, lang, n_chars``.  Returns
    (curated ``doc_id, component, split`` DataFrame, stage counts).
    """
    stats: dict[str, int] = {"input": docs.count()}

    # 1. URL-level dedup: min doc_id per normalized URL survives
    keep_urls = url_dedup(docs).select(
        F.col("keep_doc_id").alias("doc_id")
    )
    s1 = docs.join(keep_urls, "doc_id", "left_semi")
    stats["after_url_dedup"] = s1.count()

    # 2. per-domain language prior over the URL-deduped set
    dom = s1.select(
        registered_domain(url_host(F.col("url"))).alias("domain"), "doc_id",
        "lang",
    )
    dstat = dom.groupBy("domain").agg(
        F.round(
            F.sum(F.when(F.col("lang") == "en", 1).otherwise(0))
            / F.count(F.lit(1)),
            6,
        ).alias("en_frac")
    )
    good_ids = (
        dom.join(dstat, "domain")
        .where(F.col("en_frac") >= min_lang_frac)
        .select("doc_id")
    )
    s2 = s1.join(good_ids, "doc_id", "left_semi")
    stats["after_domain_filter"] = s2.count()

    # 3. repetition quality: flagged docs drop, no-signal docs pass
    rep = doc_repetition(s2).select("doc_id", "flagged")
    s3 = s2.join(rep, "doc_id", "left").where(
        F.col("flagged").isNull() | ~F.col("flagged")
    ).drop("flagged")
    s3 = s3.persist()
    if cache_registry is not None:
        cache_registry.append(s3)
    stats["after_repetition"] = s3.count()

    # 4. near-dup clusters → keep the highest-n_chars copy per cluster
    pairs = minhash_lsh_dedup(
        s3, threshold=jaccard_threshold, cache_registry=cache_registry
    )
    clusters = neardup_clusters(pairs)
    keepers = canonical_select(
        clusters, s3.select("doc_id", F.col("n_chars").alias("score"))
    ).select(F.col("keep_doc_id").alias("doc_id"))
    losers = clusters.select("doc_id").join(keepers, "doc_id", "left_anti")
    s4 = s3.join(losers, "doc_id", "left_anti")
    stats["after_neardup_keep"] = s4.count()

    # 5. leakage-safe split on the cluster representative
    out = leakage_safe_split(
        s4, clusters, train_frac=train_frac, val_frac=val_frac
    )
    return out, stats
