"""Incremental minhash dedup: batch-over-batch equivalence with rebuild."""

from __future__ import annotations

from pyspark.sql import functions as F

from batch_data_pipeline_exercise_spark.operators import dedup


def _docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "the quick brown fox jumps over the lazy dog again and again"),  # dup of 1
        (3, "completely different text about spark shuffle partitions here"),
        (4, "the quick brown fox jumps over the lazy dog again and AGAIN"),  # near-dup of 1
        (5, "another unrelated document mentioning hash joins and buckets"),
        (6, "completely different text about spark shuffle partitions here"),  # dup of 3
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _pairset(df):
    return {(r["id1"], r["id2"]) for r in df.collect()}


def test_incremental_equals_rebuild_restricted(spark):
    d = _docs(spark)
    new = d.filter(F.col("doc_id") >= 5)
    prior = d.filter(F.col("doc_id") < 5)

    full_keys = dedup.lsh_band_keys(
        dedup.minhash_signatures(dedup.word_shingles(d, "doc_id", distinct=False), 32), 8, 4
    )
    full = _pairset(dedup.lsh_candidate_pairs(full_keys))
    expected = {p for p in full if p[0] >= 5 or p[1] >= 5}

    prior_keys = dedup.lsh_band_keys(
        dedup.minhash_signatures(dedup.word_shingles(prior, "doc_id", distinct=False), 32), 8, 4
    ).localCheckpoint()
    pairs, updated = dedup.incremental_minhash_pairs(prior_keys, new, "doc_id")
    assert _pairset(pairs) == expected
    # the updated index must equal the full-rebuild index (same rows)
    assert sorted(map(tuple, updated.collect())) == sorted(map(tuple, full_keys.collect()))


def test_incremental_first_batch_is_full_selfjoin(spark):
    d = _docs(spark)
    pairs, keys = dedup.incremental_minhash_pairs(None, d, "doc_id")
    full = dedup.lsh_candidate_pairs(
        dedup.lsh_band_keys(
            dedup.minhash_signatures(dedup.word_shingles(d, "doc_id", distinct=False), 32), 8, 4
        )
    )
    assert _pairset(pairs) == _pairset(full)
    assert keys.count() == d.count() * 8  # bands per doc


def test_incremental_two_rounds_accumulate(spark):
    d = _docs(spark)
    b1 = d.filter(F.col("doc_id") <= 2)
    b2 = d.filter((F.col("doc_id") > 2) & (F.col("doc_id") <= 4))
    b3 = d.filter(F.col("doc_id") > 4)
    p1, k1 = dedup.incremental_minhash_pairs(None, b1, "doc_id")
    p2, k2 = dedup.incremental_minhash_pairs(k1.localCheckpoint(), b2, "doc_id")
    p3, k3 = dedup.incremental_minhash_pairs(k2.localCheckpoint(), b3, "doc_id")
    got = _pairset(p1) | _pairset(p2) | _pairset(p3)
    full = _pairset(
        dedup.lsh_candidate_pairs(
            dedup.lsh_band_keys(
                dedup.minhash_signatures(dedup.word_shingles(d, "doc_id", distinct=False), 32), 8, 4
            )
        )
    )
    assert got == full
