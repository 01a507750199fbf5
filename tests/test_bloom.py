"""Bloom-filter semi-join pruning (operators/bloom.py): membership
guarantees (no false negatives), measured prune power on disjoint
keys, and exact-path equivalence to a plain left_semi join."""

import pyspark.sql.functions as F
import pytest

from aws_lakehouse_spark.operators import bloom


def test_bloom_has_no_false_negatives(spark):
    keys = spark.range(0, 1000).select((F.col("id") * 7 + 3).alias("k"))
    words = bloom.build_bloom(keys, "k", num_bits=1 << 14)
    hits = keys.filter(bloom.bloom_might_contain("k", words)).count()
    assert hits == 1000  # every present key must test positive


def test_bloom_prunes_disjoint_keys(spark):
    keys = spark.range(0, 1000).select(F.col("id").alias("k"))
    words = bloom.build_bloom(keys, "k", num_bits=1 << 17)
    # probe keys entirely outside the build set
    probe = spark.range(1_000_000, 1_100_000).select(F.col("id").alias("k"))
    fp = probe.filter(bloom.bloom_might_contain("k", words)).count()
    # 2^17 bits / 1000 keys / 3 hashes -> fpp well under 1%
    assert fp < 1000, f"false-positive rate too high: {fp}/100000"


def test_bloom_semi_join_matches_exact_semi_join(spark):
    fact = spark.range(0, 20_000).select(
        (F.col("id") % 500).alias("fk"), F.col("id").alias("payload")
    )
    keys = spark.range(0, 5000).select((F.col("id") * 3).alias("dk"))
    got = bloom.bloom_semi_join(fact, keys, "fk", "dk").orderBy("payload")
    want = fact.join(
        keys.select(F.col("dk").alias("fk")).distinct(), "fk", "left_semi"
    ).orderBy("payload")
    assert [r.asDict() for r in got.collect()] == [
        r.asDict() for r in want.collect()
    ]


def test_bloom_inexact_superset_and_bounded(spark):
    fact = spark.range(0, 10_000).select((F.col("id") % 1000).alias("fk"))
    keys = spark.range(0, 100).select(F.col("id").alias("dk"))
    exact_n = fact.join(
        keys.select(F.col("dk").alias("fk")), "fk", "left_semi"
    ).count()
    pruned = bloom.bloom_semi_join(fact, keys, "fk", "dk", exact=False)
    n = pruned.count()
    assert exact_n <= n <= exact_n + 10_000 * 0.05  # superset, near-exact


def test_bloom_rejects_unaligned_bits(spark):
    keys = spark.range(3).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="multiple of 64"):
        bloom.build_bloom(keys, "k", num_bits=100)


def test_incremental_bloom_status_equals_broadcast_version(spark):
    from aws_lakehouse_spark.catalog import load_table
    from aws_lakehouse_spark.llm.dedup import (
        incremental_exact_status,
        incremental_exact_status_bloom,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    batch = docs.filter(F.col("doc_id") % 5 == 0)
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    a = {
        r["doc_id"]: r["status"]
        for r in incremental_exact_status(batch, corpus, "doc_id", "text").collect()
    }
    b = {
        r["doc_id"]: r["status"]
        for r in incremental_exact_status_bloom(
            batch, corpus, "doc_id", "text"
        ).collect()
    }
    assert a == b and len(a) > 0
