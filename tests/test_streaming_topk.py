"""Streaming top-k maintenance: batch parity, no-op re-run, replay."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from batch_data_pipeline_exercise_spark.sources.warehouse import Warehouse
from batch_data_pipeline_exercise_spark.streaming import topk_stream

ROWS = [
    # (orderkey, custkey, price)
    (1, 10, 50.0), (2, 10, 90.0), (3, 10, 70.0), (4, 10, 60.0),
    (5, 20, 10.0), (6, 20, 30.0),
    (7, 30, 99.0),
]


def _drop(raw_dir, name, rows):
    with open(f"{raw_dir}/{name}", "w") as f:
        for ok, ck, p in rows:
            f.write(json.dumps({"o_orderkey": ok, "o_custkey": ck, "o_totalprice": p}) + "\n")


@pytest.fixture()
def dirs(tmp_path):
    raw = tmp_path / "raw"
    raw.mkdir()
    return str(raw), str(tmp_path / "wh"), str(tmp_path / "ckpt")


def _full_topk(spark, rows, k=3):
    df = spark.createDataFrame(rows, "o_orderkey long, o_custkey long, o_totalprice double")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return {
        (r["o_custkey"], r["o_orderkey"], r["rnk"])
        for r in df.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= k).collect()
    }


def test_streaming_topk_folds_batches_and_matches_full(spark, dirs):
    raw, wh_dir, ckpt = dirs
    wh = Warehouse(spark, wh_dir)
    _drop(raw, "orders_01.jsonl", ROWS[:4])
    q = topk_stream.streaming_topk_orders(spark, raw, wh, ckpt)
    q.awaitTermination(120)
    got1 = {
        (r["o_custkey"], r["o_orderkey"], r["rnk"])
        for r in wh.read("topk_orders_per_customer").collect()
    }
    assert got1 == _full_topk(spark, ROWS[:4])

    _drop(raw, "orders_02.jsonl", ROWS[4:])
    q2 = topk_stream.streaming_topk_orders(spark, raw, wh, ckpt)
    q2.awaitTermination(120)
    got2 = {
        (r["o_custkey"], r["o_orderkey"], r["rnk"])
        for r in wh.read("topk_orders_per_customer").collect()
    }
    assert got2 == _full_topk(spark, ROWS)

    # same checkpoint re-run: no-op
    q3 = topk_stream.streaming_topk_orders(spark, raw, wh, ckpt)
    q3.awaitTermination(120)
    assert {
        (r["o_custkey"], r["o_orderkey"], r["rnk"])
        for r in wh.read("topk_orders_per_customer").collect()
    } == got2


def test_streaming_topk_drops_null_keys_and_rewrites_touched_buckets_only(spark, dirs):
    raw, wh_dir, ckpt = dirs
    wh = Warehouse(spark, wh_dir)
    _drop(raw, "orders_01.jsonl", ROWS)
    # a corrupt line: missing order key (PERMISSIVE json null-fills) —
    # must be ignored, not ranked into a slot the anti-join can't guard
    with open(f"{raw}/orders_01.jsonl", "a") as f:
        f.write(json.dumps({"o_custkey": 10, "o_totalprice": 999.0}) + "\n")
    q = topk_stream.streaming_topk_orders(spark, raw, wh, ckpt)
    q.awaitTermination(120)
    got = {
        (r["o_custkey"], r["o_orderkey"], r["rnk"])
        for r in wh.read("topk_orders_per_customer").collect()
    }
    assert got == _full_topk(spark, ROWS)  # null-key row absent
    # the table is bucket-partitioned so later batches commit through
    # the dynamic partition overwrite, touching only their buckets
    assert wh.partition_columns("topk_orders_per_customer") == ["__bucket"]


def test_streaming_topk_empty_bootstrap_does_not_poison_table(spark, dirs):
    """An all-corrupt first drop must not create a schema-less table
    that breaks every later read."""
    raw, wh_dir, ckpt = dirs
    wh = Warehouse(spark, wh_dir)
    with open(f"{raw}/orders_01.jsonl", "w") as f:
        f.write(json.dumps({"o_custkey": 10, "o_totalprice": 999.0}) + "\n")  # no key
    q = topk_stream.streaming_topk_orders(spark, raw, wh, ckpt)
    q.awaitTermination(120)
    assert not wh.exists("topk_orders_per_customer")
    # a later good drop bootstraps normally
    _drop(raw, "orders_02.jsonl", ROWS)
    q2 = topk_stream.streaming_topk_orders(spark, raw, wh, ckpt)
    q2.awaitTermination(120)
    got = {
        (r["o_custkey"], r["o_orderkey"], r["rnk"])
        for r in wh.read("topk_orders_per_customer").collect()
    }
    assert got == _full_topk(spark, ROWS)


def test_streaming_topk_rejects_changed_bucket_count(spark, dirs, tmp_path):
    raw, wh_dir, ckpt = dirs
    wh = Warehouse(spark, wh_dir)
    _drop(raw, "orders_01.jsonl", ROWS[:4])
    q = topk_stream.streaming_topk_orders(spark, raw, wh, ckpt, n_buckets=64)
    q.awaitTermination(120)
    _drop(raw, "orders_02.jsonl", ROWS[4:])
    q2 = topk_stream.streaming_topk_orders(
        spark, raw, wh, str(tmp_path / "ckpt2"), n_buckets=7
    )
    with pytest.raises(Exception, match="n_buckets"):
        q2.awaitTermination(120)
        q2.processAllAvailable()


def test_streaming_topk_replay_converges(spark, dirs, tmp_path):
    """Fresh checkpoint over the same files (crash-replay worst case):
    deterministic ranking makes re-folding already-stored rows a
    no-op, so the table converges to the same top-k."""
    raw, wh_dir, ckpt = dirs
    wh = Warehouse(spark, wh_dir)
    _drop(raw, "orders_01.jsonl", ROWS)
    q = topk_stream.streaming_topk_orders(spark, raw, wh, ckpt)
    q.awaitTermination(120)
    before = sorted(map(tuple, wh.read("topk_orders_per_customer").collect()))
    q2 = topk_stream.streaming_topk_orders(spark, raw, wh, str(tmp_path / "ckpt2"))
    q2.awaitTermination(120)
    assert sorted(map(tuple, wh.read("topk_orders_per_customer").collect())) == before
