"""Streaming incremental dedup: foreachBatch LSH-index fold tests."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from batch_data_pipeline_exercise_spark.operators import dedup
from batch_data_pipeline_exercise_spark.sources.warehouse import Warehouse
from batch_data_pipeline_exercise_spark.streaming import dedup_stream

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog again and again"),
    (2, "the quick brown fox jumps over the lazy dog again and again"),  # dup of 1
    (3, "completely different text about spark shuffle partitions here"),
    (4, "the quick brown fox jumps over the lazy dog again and AGAIN"),  # near-dup of 1
    (5, "another unrelated document mentioning hash joins and buckets"),
    (6, "completely different text about spark shuffle partitions here"),  # dup of 3
]


def _drop(raw_dir, name, docs):
    with open(f"{raw_dir}/{name}", "w") as f:
        for doc_id, text in docs:
            f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")


def _full_pairs(spark):
    d = spark.createDataFrame(DOCS, ["doc_id", "text"])
    keys = dedup.lsh_band_keys(
        dedup.minhash_signatures(dedup.word_shingles(d, "doc_id", distinct=False), 32), 8, 4
    )
    return {(r["id1"], r["id2"]) for r in dedup.lsh_candidate_pairs(keys).collect()}


@pytest.fixture()
def dirs(tmp_path):
    raw = tmp_path / "raw"
    raw.mkdir()
    return str(raw), str(tmp_path / "wh"), str(tmp_path / "ckpt")


def test_streaming_dedup_folds_batches(spark, dirs):
    raw, wh_dir, ckpt = dirs
    wh = Warehouse(spark, wh_dir)
    full = _full_pairs(spark)

    # drop 1: docs 1-4 → pairs among them
    _drop(raw, "docs_01.jsonl", DOCS[:4])
    q = dedup_stream.streaming_incremental_dedup(spark, raw, wh, ckpt)
    q.awaitTermination(120)
    got1 = {(r["id1"], r["id2"]) for r in wh.read("near_dup_pairs").collect()}
    assert got1 == {p for p in full if p[0] <= 4 and p[1] <= 4}
    assert wh.read("lsh_band_index").select("id").distinct().count() == 4

    # drop 2: docs 5-6 → only new-touching pairs appended, index grows
    _drop(raw, "docs_02.jsonl", DOCS[4:])
    q2 = dedup_stream.streaming_incremental_dedup(spark, raw, wh, ckpt)
    q2.awaitTermination(120)
    got2 = {(r["id1"], r["id2"]) for r in wh.read("near_dup_pairs").collect()}
    assert got2 == full
    assert wh.read("lsh_band_index").select("id").distinct().count() == 6

    # re-run, nothing new: checkpoint makes it a no-op
    q3 = dedup_stream.streaming_incremental_dedup(spark, raw, wh, ckpt)
    q3.awaitTermination(120)
    assert wh.read("near_dup_pairs").count() == len(full)


def test_streaming_dedup_replay_is_idempotent(spark, dirs, tmp_path):
    """Fresh checkpoint over the same files (the crash-replay worst case)
    must not duplicate pairs or index rows."""
    raw, wh_dir, ckpt = dirs
    wh = Warehouse(spark, wh_dir)
    _drop(raw, "docs_01.jsonl", DOCS)
    q = dedup_stream.streaming_incremental_dedup(spark, raw, wh, ckpt)
    q.awaitTermination(120)
    n_pairs = wh.read("near_dup_pairs").count()
    n_index = wh.read("lsh_band_index").count()
    assert n_pairs == len(_full_pairs(spark))

    q2 = dedup_stream.streaming_incremental_dedup(spark, raw, wh, str(tmp_path / "ckpt2"))
    q2.awaitTermination(120)
    assert wh.read("near_dup_pairs").count() == n_pairs
    assert wh.read("lsh_band_index").count() == n_index


def test_streaming_equals_batch_on_real_drops(spark, dirs, sf_dir):
    """streaming ≡ batch: folding the same three document drops through
    the foreachBatch stream and through direct incremental_minhash_pairs
    calls must leave IDENTICAL pair sets and band-key index contents —
    the streaming wrapper adds delivery semantics, never different math.
    Real sf0.001 documents, not toy strings."""
    raw, wh_dir, ckpt = dirs
    wh = Warehouse(spark, wh_dir)
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 150)
    )

    # batch twin: three increments through the operator directly
    batch_pairs: set[tuple[int, int]] = set()
    prior = None
    for i in range(3):
        inc = docs.filter(F.col("doc_id") % 3 == i)
        pairs, prior = dedup.incremental_minhash_pairs(prior, inc, "doc_id")
        prior = prior.localCheckpoint()
        batch_pairs |= {(r["id1"], r["id2"]) for r in pairs.collect()}
    batch_index = {
        (r["id"], r["band"], r["band_key"]) for r in prior.collect()
    }

    # streaming side: same three increments as jsonl drops, one
    # availableNow run each so every drop is its own micro-batch
    rows = docs.collect()
    for i in range(3):
        _drop(raw, f"docs_{i:02d}.jsonl", [(r["doc_id"], r["text"]) for r in rows if r["doc_id"] % 3 == i])
        q = dedup_stream.streaming_incremental_dedup(spark, raw, wh, ckpt)
        q.awaitTermination(180)

    stream_pairs = {(r["id1"], r["id2"]) for r in wh.read("near_dup_pairs").collect()}
    stream_index = {
        (r["id"], r["band"], r["band_key"]) for r in wh.read("lsh_band_index").collect()
    }
    assert stream_pairs == batch_pairs
    assert stream_index == batch_index


def test_streaming_embedding_dedup_equals_batch(spark, dirs, tmp_path):
    """Embedding-space streaming ≡ batch: the foreachBatch sign-sketch
    fold over three real embedding drops must leave the same verified
    pair set and index contents as direct incremental_embedding_pairs
    calls on the same increments."""
    from batch_data_pipeline_exercise_spark.operators import similarity

    raw, wh_dir, ckpt = dirs
    wh = Warehouse(spark, wh_dir)
    embs = (
        spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
        .filter(F.col("vec_id") < 300)
    )

    batch_pairs: set[tuple[int, int]] = set()
    prior = None
    for i in range(3):
        inc = embs.filter(F.col("vec_id") % 3 == i)
        pairs, prior = similarity.incremental_embedding_pairs(
            prior, inc, 0.4, 8, 8, 42, "vec_id", "embedding", 64
        )
        prior = prior.localCheckpoint()
        batch_pairs |= {(r["id1"], r["id2"]) for r in pairs.collect()}
    batch_index_ids = {r["id"] for r in prior.select("id").collect()}

    rows = embs.collect()
    for i in range(3):
        with open(f"{raw}/vecs_{i:02d}.jsonl", "w") as f:
            for r in rows:
                if r["vec_id"] % 3 == i:
                    f.write(json.dumps({"vec_id": r["vec_id"], "embedding": list(r["embedding"])}) + "\n")
        q = dedup_stream.streaming_embedding_dedup(spark, raw, wh, ckpt, dim=64, threshold=0.4)
        q.awaitTermination(180)

    stream_pairs = {(r["id1"], r["id2"]) for r in wh.read("embedding_near_dups").collect()}
    assert stream_pairs == batch_pairs
    assert {r["id"] for r in wh.read("sign_sketch_index").collect()} == batch_index_ids
    # replay with a fresh checkpoint: no duplicates, no index growth
    q2 = dedup_stream.streaming_embedding_dedup(
        spark, raw, wh, str(tmp_path / "ckpt2"), dim=64, threshold=0.4
    )
    q2.awaitTermination(180)
    assert wh.read("embedding_near_dups").count() == len(stream_pairs)
    assert wh.read("sign_sketch_index").select("id").count() == len(batch_index_ids)
