"""Streaming novelty maintenance: fold == one-shot batch, replay no-op."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from batch_data_pipeline_exercise_spark.sources.warehouse import Warehouse
from batch_data_pipeline_exercise_spark.streaming import novelty_stream

DOCS = [
    (1, "alpha beta gamma delta epsilon zeta eta theta"),
    (2, "alpha beta gamma delta epsilon zeta eta theta"),  # exact dup of 1
    (3, "one two three four five six seven eight nine ten"),
    (4, "alpha beta gamma delta NEW words appear here now"),
    (5, "one two three four five six seven eight nine ten eleven"),
    (6, "totally fresh content with nothing shared at all whatsoever"),
]


def _drop(raw_dir, name, docs):
    with open(f"{raw_dir}/{name}", "w") as f:
        for doc_id, text in docs:
            f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")


def _novelty_map(df):
    return {
        r["doc_id"]: (r["n_grams"], r["novel_grams"], r["novelty"]) for r in df.collect()
    }


def _batch_novelty(spark):
    d = spark.createDataFrame(DOCS, ["doc_id", "text"])
    nov, _, _ = novelty_stream.fold_novelty(None, d)
    return _novelty_map(nov)


def test_fold_slicing_matches_one_shot(spark):
    d = lambda rows: spark.createDataFrame(rows, ["doc_id", "text"])
    full = _batch_novelty(spark)
    n1, i1, _ = novelty_stream.fold_novelty(None, d(DOCS[:2]))
    n2, i2, _ = novelty_stream.fold_novelty(i1.localCheckpoint(), d(DOCS[2:4]))
    n3, _, _ = novelty_stream.fold_novelty(i2.localCheckpoint(), d(DOCS[4:]))
    got = {**_novelty_map(n1), **_novelty_map(n2), **_novelty_map(n3)}
    assert got == full


def test_first_doc_fully_novel_and_dup_fully_stale(spark):
    full = _batch_novelty(spark)
    assert full[1][2] == 1.0  # first doc: everything novel
    assert full[2][1] == 0  # exact dup: zero novel grams
    assert full[6][2] == 1.0  # disjoint content: fully novel


@pytest.fixture()
def dirs(tmp_path):
    raw = tmp_path / "raw"
    raw.mkdir()
    return str(raw), str(tmp_path / "wh"), str(tmp_path / "ckpt")


def test_streaming_matches_batch_and_replay_is_noop(spark, dirs):
    raw, wh_dir, ckpt = dirs
    wh = Warehouse(spark, wh_dir)
    full = _batch_novelty(spark)

    _drop(raw, "docs_01.jsonl", DOCS[:3])
    novelty_stream.streaming_novelty(spark, raw, wh, ckpt).awaitTermination(120)
    _drop(raw, "docs_02.jsonl", DOCS[3:])
    novelty_stream.streaming_novelty(spark, raw, wh, ckpt).awaitTermination(120)

    assert _novelty_map(wh.read("doc_novelty")) == full
    index_rows = wh.read("gram_first_index").count()

    # fresh checkpoint over the same drops: scored docs are anti-joined
    # away, the index is unchanged
    novelty_stream.streaming_novelty(spark, raw, wh, ckpt + "_fresh").awaitTermination(120)
    assert _novelty_map(wh.read("doc_novelty")) == full
    assert wh.read("gram_first_index").count() == index_rows
    # index is consistent: one row per distinct gram, first_doc is a real doc
    idx = wh.read("gram_first_index")
    assert idx.groupBy("g").count().filter(F.col("count") > 1).count() == 0


def test_crash_between_index_and_novelty_writes_replays_correctly(spark, dirs):
    """Simulate the crash window the protocol defends: the index append
    for a drop committed, the novelty append did not. Replay must score
    the drop exactly as the uncrashed run would (the >= first_new rule)
    and append nothing new to the index."""
    raw, wh_dir, ckpt = dirs
    from batch_data_pipeline_exercise_spark.sources.warehouse import Warehouse

    wh = Warehouse(spark, wh_dir)
    full = _batch_novelty(spark)

    _drop(raw, "docs_01.jsonl", DOCS[:3])
    novelty_stream.streaming_novelty(spark, raw, wh, ckpt).awaitTermination(120)

    # crash simulation for drop 2: index rows land, novelty rows do not
    d2 = spark.createDataFrame(DOCS[3:], ["doc_id", "text"])
    _, _, fresh = novelty_stream.fold_novelty(wh.read("gram_first_index"), d2)
    wh.append(fresh.withColumn("n", F.lit(5)), "gram_first_index")
    index_rows_after_crash = wh.read("gram_first_index").count()

    # replay: the stream now sees drop 2's file for the first time
    _drop(raw, "docs_02.jsonl", DOCS[3:])
    novelty_stream.streaming_novelty(spark, raw, wh, ckpt).awaitTermination(120)

    assert _novelty_map(wh.read("doc_novelty")) == full
    assert wh.read("gram_first_index").count() == index_rows_after_crash


def test_n_mismatch_refused(spark, dirs):
    raw, wh_dir, ckpt = dirs
    from batch_data_pipeline_exercise_spark.sources.warehouse import Warehouse

    wh = Warehouse(spark, wh_dir)
    _drop(raw, "docs_01.jsonl", DOCS[:3])
    novelty_stream.streaming_novelty(spark, raw, wh, ckpt).awaitTermination(120)
    _drop(raw, "docs_02.jsonl", DOCS[3:])
    with pytest.raises(Exception, match="built with n=5"):
        novelty_stream.streaming_novelty(spark, raw, wh, ckpt + "_n3", n=3).awaitTermination(120)
