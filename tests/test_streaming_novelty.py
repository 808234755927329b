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
    nov, _ = novelty_stream.fold_novelty(None, d)
    return _novelty_map(nov)


def test_fold_slicing_matches_one_shot(spark):
    d = lambda rows: spark.createDataFrame(rows, ["doc_id", "text"])
    full = _batch_novelty(spark)
    n1, i1 = novelty_stream.fold_novelty(None, d(DOCS[:2]))
    n2, i2 = novelty_stream.fold_novelty(i1.localCheckpoint(), d(DOCS[2:4]))
    n3, _ = novelty_stream.fold_novelty(i2.localCheckpoint(), d(DOCS[4:]))
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
