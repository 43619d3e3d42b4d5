"""Inverted-index (salted two-stage agg) + storage-seam tests."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from ocr_spark.io import Catalog
from ocr_spark.operators.index import inverted_index
from ocr_spark.plans import checks

SF = "/root/testdata/sf0.001"


def test_inverted_index_salting_is_invisible(spark):
    """Different salt counts must give identical results (salting is a
    physical strategy, not a semantic one)."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    a = {r["word"]: (r["postings"], r["df"])
         for r in inverted_index(docs, n_salts=1).collect()}
    b = {r["word"]: (r["postings"], r["df"])
         for r in inverted_index(docs, n_salts=16).collect()}
    assert a == b
    # postings sorted, df consistent
    for w, (p, df) in a.items():
        assert p == sorted(p) and df == len(p)


def test_inverted_index_postings_cap(spark):
    """max_postings bounds the stored hot-word array; df stays exact and
    the row is flagged truncated."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    exact = {r["word"]: r for r in
             inverted_index(docs, max_postings=None).collect()}
    capped = {r["word"]: r for r in
              inverted_index(docs, max_postings=3).collect()}
    assert set(exact) == set(capped)
    hot = 0
    for w, r in capped.items():
        e = exact[w]
        assert r["df"] == e["df"] == len(e["postings"])
        assert r["postings"] == e["postings"][:3]
        assert r["truncated"] == (e["df"] > 3)
        hot += r["truncated"]
    assert hot > 0  # the corpus does have words with df > 3


def test_inverted_index_two_stage_plan(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    q = inverted_index(docs, n_salts=16)
    # distinct + two agg stages → 3 exchanges, never more
    assert checks.count_exchanges(q) <= 3


def test_catalog_parquet_roundtrip(spark, tmp_path):
    cat = Catalog(kind="parquet", root=str(tmp_path))
    df = spark.range(10).withColumn("b", F.col("id") % 2)
    cat.write(df, "t", partition_by=("b",))
    back = cat.read(spark, "t")
    assert back.count() == 10
    assert sorted(r["id"] for r in back.collect()) == list(range(10))


def test_catalog_iceberg_unavailable(spark):
    import pytest

    cat = Catalog(kind="iceberg", root="cat")
    with pytest.raises(RuntimeError, match="[Ii]ceberg"):
        cat.read(spark, "t")
