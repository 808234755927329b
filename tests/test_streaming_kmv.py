"""Streaming KMV sketch maintenance: lattice-fold exactness, stream vs
batch parity, replay idempotency."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from batch_data_pipeline_exercise_spark.sources.warehouse import Warehouse
from batch_data_pipeline_exercise_spark.streaming import kmv_stream

EVENTS = [
    (i, 100 + (i * 7) % 23, ["click", "view", "purchase"][i % 3]) for i in range(90)
]


def _drop(raw_dir, name, rows):
    with open(f"{raw_dir}/{name}", "w") as f:
        for event_id, user_id, event_type in rows:
            f.write(
                json.dumps({"event_id": event_id, "user_id": user_id, "event_type": event_type})
                + "\n"
            )


def _df(spark, rows):
    return spark.createDataFrame(rows, ["event_id", "user_id", "event_type"])


def _sketch_set(df):
    return {(r["event_type"], r["h"]) for r in df.collect()}


def test_fold_is_slicing_invariant(spark):
    """Any batch slicing folds to the identical sketch table — KMV is a
    lattice fold, so this is exact equality of rows, not tolerance."""
    full = kmv_stream.fold_kmv(None, _df(spark, EVENTS), "event_type", "user_id", k=8)
    s1 = kmv_stream.fold_kmv(None, _df(spark, EVENTS[:10]), "event_type", "user_id", k=8)
    s2 = kmv_stream.fold_kmv(s1.localCheckpoint(), _df(spark, EVENTS[10:55]), "event_type", "user_id", k=8)
    s3 = kmv_stream.fold_kmv(s2.localCheckpoint(), _df(spark, EVENTS[55:]), "event_type", "user_id", k=8)
    assert _sketch_set(s3) == _sketch_set(full)


def test_fold_is_idempotent(spark):
    once = kmv_stream.fold_kmv(None, _df(spark, EVENTS), "event_type", "user_id", k=8)
    again = kmv_stream.fold_kmv(once.localCheckpoint(), _df(spark, EVENTS), "event_type", "user_id", k=8)
    assert _sketch_set(again) == _sketch_set(once)


def test_sketch_bounded_and_estimates_sane(spark):
    k = 8
    stored = kmv_stream.fold_kmv(None, _df(spark, EVENTS), "event_type", "user_id", k=k)
    sizes = {r["event_type"]: r["n"] for r in stored.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert all(n <= k for n in sizes.values())
    est = {r["event_type"]: r for r in kmv_stream.kmv_estimates(stored, "event_type", k=k).collect()}
    exact = {
        r["event_type"]: r["n"]
        for r in _df(spark, EVENTS).groupBy("event_type").agg(F.countDistinct("user_id").alias("n")).collect()
    }
    for t, n in exact.items():
        row = est[t]
        if n < k:
            assert row["distinct_est"] == float(n)
        else:
            # k=8 → ~38% rse; generous 3σ band on tiny fixtures
            assert abs(row["distinct_est"] - n) <= max(3 * n / 2.6, 2.0)


@pytest.fixture()
def dirs(tmp_path):
    raw = tmp_path / "raw"
    raw.mkdir()
    return str(raw), str(tmp_path / "wh"), str(tmp_path / "ckpt")


def test_streaming_matches_direct_fold(spark, dirs):
    raw, wh_dir, ckpt = dirs
    wh = Warehouse(spark, wh_dir)
    expected = _sketch_set(kmv_stream.fold_kmv(None, _df(spark, EVENTS), "event_type", "user_id"))

    _drop(raw, "events_01.jsonl", EVENTS[:40])
    q = kmv_stream.streaming_kmv_reach(spark, raw, wh, ckpt)
    q.awaitTermination(120)
    _drop(raw, "events_02.jsonl", EVENTS[40:])
    q2 = kmv_stream.streaming_kmv_reach(spark, raw, wh, ckpt)
    q2.awaitTermination(120)

    assert _sketch_set(wh.read("kmv_user_sketch")) == expected

    # replay with a FRESH checkpoint over the same drops: the fold is
    # idempotent, so the sketch table is unchanged
    q3 = kmv_stream.streaming_kmv_reach(spark, raw, wh, str(dirs[2]) + "_fresh")
    q3.awaitTermination(120)
    assert _sketch_set(wh.read("kmv_user_sketch")) == expected


def test_null_ids_never_occupy_sketch_slots(spark):
    """A NULL id hashes to NULL, which would sort first and permanently
    evict a real hash — the fold must drop NULL ids up front."""
    rows = [(1, 100, "click"), (2, None, "click"), (3, 200, "click")]
    df = spark.createDataFrame(rows, "event_id int, user_id int, event_type string")
    stored = kmv_stream.fold_kmv(None, df, "event_type", "user_id", k=4)
    got = stored.collect()
    assert len(got) == 2 and all(r["h"] is not None for r in got)
    est = kmv_stream.kmv_estimates(stored, "event_type", k=4).collect()[0]
    assert est["distinct_est"] == 2.0  # cnt < k: exact regime, both real users
