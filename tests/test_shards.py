"""Training-shard writer (jobs/shards.py): deterministic assignment,
idempotent re-write, manifest integrity, and balance."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from ocr_spark.jobs.shards import (
    shard_assign,
    shard_stats,
    verify_shards,
    write_training_shards,
)
from ocr_spark.operators.packing import pack_sequences


def _docs(spark, n=200):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("src"), (F.col("id") % 5).cast("string")).alias(
            "source"
        ),
        F.concat_ws(
            " ",
            F.lit("alpha beta gamma delta"),
            F.col("id").cast("string"),
            F.lit("epsilon zeta eta theta iota kappa"),
        ).alias("text"),
    )


def test_shard_assignment_deterministic_and_complete(spark):
    seqs = pack_sequences(_docs(spark), seq_len=32)
    a = shard_assign(seqs, 8)
    b = shard_assign(seqs, 8)
    assert a.count() == seqs.count()
    assert (
        a.join(b, ["source", "win_id"])
        .where(a["shard"] != b["shard"])
        .count()
        == 0
    )
    assert a.where((F.col("shard") < 0) | (F.col("shard") >= 8)).count() == 0


def test_write_is_idempotent_and_manifest_verifies(spark):
    with tempfile.TemporaryDirectory() as tmp:
        out = os.path.join(tmp, "shards")
        m1 = write_training_shards(
            spark, _docs(spark), out, n_shards=8, seq_len=32
        )
        rows1 = sorted(
            (r["shard"], r["n_seqs"], r["n_tokens"], r["fp_sum"])
            for r in m1.collect()
        )
        data1 = spark.read.parquet(f"{out}/data").count()
        assert verify_shards(spark, out)

        # re-run: dynamic overwrite must not append duplicates
        m2 = write_training_shards(
            spark, _docs(spark), out, n_shards=8, seq_len=32
        )
        rows2 = sorted(
            (r["shard"], r["n_seqs"], r["n_tokens"], r["fp_sum"])
            for r in m2.collect()
        )
        assert rows1 == rows2
        assert spark.read.parquet(f"{out}/data").count() == data1
        assert verify_shards(spark, out)


def test_manifest_matches_direct_stats(spark):
    seqs = shard_assign(pack_sequences(_docs(spark), seq_len=32), 8)
    direct = {
        r["shard"]: (r["n_seqs"], r["n_tokens"], r["fp_sum"])
        for r in shard_stats(seqs).collect()
    }
    total = sum(v[0] for v in direct.values())
    assert total == seqs.count()
    # md5 keys spread: no shard should swallow the majority
    assert max(v[0] for v in direct.values()) < total


def test_verify_detects_tamper(spark):
    with tempfile.TemporaryDirectory() as tmp:
        out = os.path.join(tmp, "shards")
        write_training_shards(spark, _docs(spark), out, n_shards=4, seq_len=32)
        # tamper: drop one shard's data files
        victim = next(
            d
            for d in os.listdir(f"{out}/data")
            if d.startswith("shard=")
        )
        for f in os.listdir(f"{out}/data/{victim}"):
            os.remove(f"{out}/data/{victim}/{f}")
        os.rmdir(f"{out}/data/{victim}")
        assert not verify_shards(spark, out)
