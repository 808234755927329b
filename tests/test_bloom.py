"""Bloom word-table operator: no false negatives, real pruning, edge
cases (empty build side, word-boundary bit positions)."""

from __future__ import annotations

from pyspark.sql import functions as F

from batch_data_pipeline_exercise_spark.operators import bloom


def test_no_false_negatives(spark, sf_dir):
    """Every value actually present in the build side must survive
    bloom_prune — the property the contamination query's exactness
    rests on."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    build = docs.filter(F.col("doc_id") % 10 == 0).select(F.col("source").alias("g")).distinct()
    probe = docs.select("doc_id", F.col("source").alias("g"))
    bf = bloom.bloom_build(build, "g", m_bits=1 << 12, k=3)
    pruned = bloom.bloom_prune(probe, "g", bf)
    exact = probe.join(build, "g")
    missed = exact.select("doc_id", "g").exceptAll(pruned.select("doc_id", "g"))
    assert missed.count() == 0


def test_prunes_non_members(spark):
    """With a roomy filter, values far from the build set are dropped."""
    build = spark.range(100).select(F.concat(F.lit("key_"), F.col("id")).alias("v"))
    probe = spark.range(100, 5100).select(F.concat(F.lit("other_"), F.col("id")).alias("v"))
    m = 1 << 16
    bf = bloom.bloom_build(build, "v", m_bits=m, k=3)
    survivors = bloom.bloom_prune(probe, "v", bf).count()
    # 300 set bits in 65536 → per-probe FP rate ~ (300/65536)^3 ≈ 1e-7
    assert survivors <= 2


def test_empty_build_side(spark):
    build = spark.range(0).select(F.col("id").cast("string").alias("v"))
    probe = spark.range(10).select(F.col("id").cast("string").alias("v"))
    bf = bloom.bloom_build(build, "v")
    assert bloom.bloom_prune(probe, "v", bf).count() == 0


def test_word_table_bounded(spark):
    build = spark.range(10_000).select(F.col("id").cast("string").alias("v"))
    m = 1 << 12
    bf = bloom.bloom_build(build, "v", m_bits=m, k=3)
    words = bf.words.collect()
    assert (bf.m_bits, bf.k) == (m, 3)
    assert len(words) <= m // 64
    assert all(0 <= r["word_idx"] < m // 64 for r in words)


def test_m_bits_validation(spark):
    import pytest

    df = spark.range(1).select(F.col("id").cast("string").alias("v"))
    with pytest.raises(ValueError):
        bloom.bloom_build(df, "v", m_bits=100)
