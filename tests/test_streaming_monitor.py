"""Streaming volume monitor: delta fold, batch parity, idempotency."""

from __future__ import annotations

import datetime as dt
import json

import pytest
from pyspark.sql import functions as F

from batch_data_pipeline_exercise_spark.operators.robust import trailing_count_anomalies
from batch_data_pipeline_exercise_spark.sources.warehouse import Warehouse
from batch_data_pipeline_exercise_spark.streaming import monitor

BASE = dt.datetime(2024, 3, 1, 12, 0, 0)


def _events(day_counts: dict[int, int], start_id: int = 0):
    """day_counts: day offset -> number of 'click' events that day."""
    rows, eid = [], start_id
    for day, n in day_counts.items():
        for _ in range(n):
            rows.append((eid, (BASE + dt.timedelta(days=day)).isoformat(sep=" "), "click"))
            eid += 1
    return rows


def _drop(raw_dir, name, rows):
    with open(f"{raw_dir}/{name}", "w") as f:
        for eid, ts, etype in rows:
            f.write(json.dumps({"event_id": eid, "ts": ts, "event_type": etype}) + "\n")


@pytest.fixture()
def dirs(tmp_path):
    raw = tmp_path / "raw"
    raw.mkdir()
    return str(raw), str(tmp_path / "wh"), str(tmp_path / "ckpt")


def test_streaming_monitor_matches_batch_flags(spark, dirs):
    raw, wh_dir, ckpt = dirs
    wh = Warehouse(spark, wh_dir)
    # 7 flat days then a spike; split across two drops mid-history
    flat = {d: 10 for d in range(7)}
    _drop(raw, "events_01.jsonl", _events(flat))
    q = monitor.streaming_volume_monitor(spark, raw, wh, ckpt)
    q.awaitTermination(120)

    _drop(raw, "events_02.jsonl", _events({7: 100, 8: 10}, start_id=1000))
    q2 = monitor.streaming_volume_monitor(spark, raw, wh, ckpt)
    q2.awaitTermination(120)

    rep = {r["d"]: r for r in monitor.anomaly_report(wh).collect()}
    days = sorted(rep)
    spike_day = days[7]
    assert rep[spike_day]["is_anomaly"] is True
    assert sum(1 for d in days if rep[d]["is_anomaly"]) == 1

    # parity: batch operator over the same raw rows gives identical flags
    all_rows = _events(flat) + _events({7: 100, 8: 10}, start_id=1000)
    batch = (
        spark.createDataFrame(all_rows, "event_id long, ts string, event_type string")
        .withColumn("ts", F.to_timestamp("ts"))
        .groupBy("event_type", F.unix_date(F.col("ts").cast("date")).cast("bigint").alias("d"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    expect = {
        (r["event_type"], r["d"]): (r["cnt"], r["is_anomaly"])
        for r in trailing_count_anomalies(batch, ["event_type"], "d", "cnt").collect()
    }
    got = {
        (r["event_type"], r["d"]): (r["cnt"], r["is_anomaly"])
        for r in monitor.anomaly_report(wh).collect()
    }
    assert got == expect


def test_streaming_hopping_window_matches_batch(spark, dirs):
    """The hopping-window expression of event_hopping_window_counts run
    under readStream (watermark + availableNow, complete-to-memory —
    complete mode is what makes the final dict comparison valid)
    produces the same final cells as the batch groupBy on the same
    rows — streaming ≡ batch for the sliding-window aggregate."""
    raw, _, ckpt = dirs
    rows = _events({0: 7, 1: 5})
    _drop(raw, "events_01.jsonl", rows)

    stream = monitor.stream_events(spark, raw).withWatermark("ts", "1 hour")
    agg = (
        stream.groupBy("event_type", F.window("ts", "15 minutes", "5 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("event_type", F.col("w.start").alias("ws"), "n_events")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("hopcells")
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["event_type"], r["ws"]): r["n_events"]
        for r in spark.sql("SELECT * FROM hopcells").collect()
    }
    batch = (
        spark.createDataFrame(rows, "event_id long, ts string, event_type string")
        .withColumn("ts", F.to_timestamp("ts"))
        .groupBy("event_type", F.window("ts", "15 minutes", "5 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("event_type", F.col("w.start").alias("ws"), "n_events")
    )
    expect = {(r["event_type"], r["ws"]): r["n_events"] for r in batch.collect()}
    assert got == expect and len(expect) > 0


def test_streaming_monitor_replay_and_compaction(spark, dirs, tmp_path):
    raw, wh_dir, ckpt = dirs
    wh = Warehouse(spark, wh_dir)
    _drop(raw, "events_01.jsonl", _events({0: 5, 1: 7}))
    q = monitor.streaming_volume_monitor(spark, raw, wh, ckpt)
    q.awaitTermination(120)
    before = sorted(map(tuple, monitor.daily_counts(wh).collect()))

    # same checkpoint: no-op
    q2 = monitor.streaming_volume_monitor(spark, raw, wh, ckpt)
    q2.awaitTermination(120)
    assert sorted(map(tuple, monitor.daily_counts(wh).collect())) == before

    # rebuild from a fresh checkpoint + fresh deltas table (the
    # documented rebuild contract) reproduces the same fold
    wh2 = Warehouse(spark, str(tmp_path / "wh2"))
    q3 = monitor.streaming_volume_monitor(spark, raw, wh2, str(tmp_path / "ckpt2"))
    q3.awaitTermination(120)
    assert sorted(map(tuple, monitor.daily_counts(wh2).collect())) == before

    # compaction bounds the table without changing the fold
    monitor.compact_deltas(wh)
    assert sorted(map(tuple, monitor.daily_counts(wh).collect())) == before
    assert wh.read("event_count_deltas").count() == 2  # one row per (type, day)
