"""Per-domain contribution cap (operators/web.py domain_cap): exactness
of the two-stage bucket prune vs the naive single-window form, cap
enforcement, tie-breaks, and repartition invariance.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ocr_spark.functions.url import registered_domain, url_host
from ocr_spark.operators.web import domain_cap


def _fixture(spark):
    rows = []
    # a mega-domain with 60 docs (quality = doc_id % 17 — has ties), two
    # small domains, and a singleton
    for i in range(60):
        rows.append((i, f"https://www.mega.com/p{i}", i % 17))
    for i in range(5):
        rows.append((100 + i, f"https://a.example.org/p{i}", 50 + i))
    rows.append((200, f"https://solo.net/x", 1))
    rows.append((201, f"https://b.example.org/y", 9))
    return spark.createDataFrame(rows, "doc_id long, url string, n_chars int")


def _naive(df, cap=3):
    staged = df.select(
        registered_domain(url_host(F.col("url"))).alias("domain"),
        "doc_id",
        "n_chars",
    )
    w = Window.partitionBy("domain").orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    return (
        staged.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= cap)
        .select("domain", "doc_id", F.col("rank").cast("int").alias("rank"))
    )


def test_two_stage_prune_is_exact(spark):
    df = _fixture(spark)
    for cap in (1, 3, 7):
        got = {(r.domain, r.doc_id, r.rank) for r in domain_cap(df, cap=cap).collect()}
        exp = {(r.domain, r.doc_id, r.rank) for r in _naive(df, cap=cap).collect()}
        assert got == exp, cap


def test_cap_and_tiebreak(spark):
    got = domain_cap(_fixture(spark), cap=3).toPandas()
    per = got.groupby("domain").size()
    assert per["mega.com"] == 3
    assert per["example.org"] == 3  # a. and b. hosts roll up to one eTLD+1
    assert per["solo.net"] == 1
    mega = got[got.domain == "mega.com"].sort_values("rank")
    # quality = doc_id % 17: max quality 16 at doc_ids 16, 33, 50 — the
    # doc_id asc tie-break must keep exactly those, in that order
    assert list(mega.doc_id) == [16, 33, 50]


def test_repartition_invariance(spark):
    df = _fixture(spark)
    a = sorted(map(tuple, domain_cap(df, cap=3).collect()))
    b = sorted(map(tuple, domain_cap(df.repartition(13), cap=3).collect()))
    assert a == b


def test_bucket_count_does_not_change_results(spark):
    df = _fixture(spark)
    a = sorted(map(tuple, domain_cap(df, cap=3, buckets=2).collect()))
    b = sorted(map(tuple, domain_cap(df, cap=3, buckets=32).collect()))
    assert a == b
