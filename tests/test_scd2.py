"""SCD2 operator tests on golden fixtures + randomized invariants.

Golden cases mirror the reference's sample-data edge cases (duplicate
delivery, consecutive same-status, out-of-order years, NULL transitions)
without copying its data. Invariant checks implement SURVEY.md §5: per-key
intervals non-overlapping, contiguous, first starts at earliest event,
open row ends at the sentinel.
"""

from __future__ import annotations

import datetime as dt
import random
from decimal import Decimal

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from batch_data_pipeline_exercise_spark.operators.scd2 import (
    current_slice,
    scd2_from_events,
    scd2_merge_events,
    scd2_snapshot_merge,
)
from batch_data_pipeline_exercise_spark.schemas import PRODUCTS_FEED, SCD2_SENTINEL
from batch_data_pipeline_exercise_spark.sources.csv_feed import read_csv_feed

FIX = "tests/fixtures"
SENT = dt.datetime(2999, 12, 31, 23, 59, 59)


def _read_products(spark, day: str):
    return read_csv_feed(spark, f"{FIX}/products_{day}.csv", PRODUCTS_FEED, ts=f"{day} 01:00:00")


def assert_scd2_invariants(df, key: str):
    """Non-overlap + contiguity + exactly one open row per key, via one
    window pass (no driver-side loops)."""
    w = Window.partitionBy(key).orderBy("start_time")
    checked = df.withColumn("__next_start", F.lead("start_time").over(w))
    bad_order = checked.filter(F.col("end_time") <= F.col("start_time")).count()
    gaps = checked.filter(F.col("__next_start").isNotNull() & (F.col("__next_start") != F.col("end_time"))).count()
    open_counts = (
        df.filter(F.col("end_time") == F.lit(SCD2_SENTINEL).cast("timestamp")).groupBy(key).count().filter("count > 1").count()
    )
    assert bad_order == 0, "interval with end <= start"
    assert gaps == 0, "non-contiguous intervals"
    assert open_counts == 0, "key with >1 open row"


# ---------------------------------------------------------------------------
# M1 — snapshot merge (dim_products)
# ---------------------------------------------------------------------------

ATTRS = ["title", "category", "price"]


def test_snapshot_merge_first_and_second_day(spark):
    day1 = _read_products(spark, "2021-03-01")
    dim1 = scd2_snapshot_merge(None, day1, key="id", attr_cols=ATTRS, ts="2021-03-01 01:00:00")
    rows1 = {r["id"]: r for r in dim1.collect()}
    assert len(rows1) == 5
    assert all(r["end_time"] == SENT for r in rows1.values())
    assert all(r["start_time"] == dt.datetime(2021, 3, 1, 1, 0) for r in rows1.values())

    day2 = _read_products(spark, "2021-03-02")
    ts2 = "2021-03-02 01:00:00"
    dim2 = scd2_snapshot_merge(dim1, day2, key="id", attr_cols=ATTRS, ts=ts2).cache()
    rows2 = [r.asDict() for r in dim2.collect()]
    by_id = {}
    for r in rows2:
        by_id.setdefault(r["id"], []).append(r)

    # p1: category tools→hardware — closed old + new open row
    p1 = sorted(by_id["p1"], key=lambda r: r["start_time"])
    assert len(p1) == 2
    assert p1[0]["end_time"] == dt.datetime(2021, 3, 2, 1, 0) and p1[0]["category"] == "tools"
    assert p1[1]["category"] == "hardware" and p1[1]["end_time"] == SENT

    # p2: price change 5.50→6.75
    p2 = sorted(by_id["p2"], key=lambda r: r["start_time"])
    assert [r["price"] for r in p2] == [Decimal("5.50"), Decimal("6.75")]
    assert p2[0]["title"] == "小型装置"  # CJK survives the pipeline

    # p3: unchanged — single open row with day-1 start
    assert len(by_id["p3"]) == 1 and by_id["p3"][0]["start_time"] == dt.datetime(2021, 3, 1, 1, 0)

    # p4: NULL→'surprise' — the null-safe predicate must detect it
    p4 = sorted(by_id["p4"], key=lambda r: r["start_time"])
    assert len(p4) == 2 and p4[0]["category"] is None and p4[1]["category"] == "surprise"

    # p5: vanished from snapshot — stays open (reference behavior)
    assert len(by_id["p5"]) == 1 and by_id["p5"][0]["end_time"] == SENT

    # p6: brand new
    assert len(by_id["p6"]) == 1 and by_id["p6"][0]["start_time"] == dt.datetime(2021, 3, 2, 1, 0)

    assert_scd2_invariants(dim2, "id")

    # point-in-time: current at day1+12h sees old category for p1
    cur = {r["id"]: r for r in current_slice(dim2, "2021-03-01 13:00:00").collect()}
    assert cur["p1"]["category"] == "tools"
    dim2.unpersist()


def test_snapshot_merge_idempotent(spark):
    day1 = _read_products(spark, "2021-03-01")
    dim1 = scd2_snapshot_merge(None, day1, key="id", attr_cols=ATTRS, ts="2021-03-01 01:00:00")
    again = scd2_snapshot_merge(dim1, day1, key="id", attr_cols=ATTRS, ts="2021-03-01 02:00:00")
    assert again.count() == dim1.count()
    assert again.filter(F.col("end_time") != F.lit(SCD2_SENTINEL).cast("timestamp")).count() == 0


# ---------------------------------------------------------------------------
# M2 — event-log SCD2 (dim_orders)
# ---------------------------------------------------------------------------


def test_scd2_from_events_golden(spark):
    from batch_data_pipeline_exercise_spark.schemas import ORDER_EVENTS_FEED

    ev = read_csv_feed(
        spark,
        f"{FIX}/orders_2021-03-02.csv",
        ORDER_EVENTS_FEED,
        ts="2021-03-02 01:00:00",
        renames={"productId": "product_id", "totalPrice": "total_price", "timestamp": "event_time"},
    )
    dim = scd2_from_events(ev, key="id", attr_cols=["status"], time_col="event_time").cache()
    by_id = {}
    for r in dim.collect():
        by_id.setdefault(r["id"], []).append(r.asDict())

    # o1: created→completed, chained intervals
    o1 = sorted(by_id["o1"], key=lambda r: r["start_time"])
    assert [r["status"] for r in o1] == ["created", "completed"]
    assert o1[0]["end_time"] == o1[1]["start_time"] == dt.datetime(2021, 3, 1, 9, 30)
    assert o1[1]["end_time"] == SENT

    # o2: exact duplicate delivery collapses to one row
    assert len(by_id["o2"]) == 1

    # o3: first observed event is 'completed' (no prior created) — kept as-is
    assert len(by_id["o3"]) == 1 and by_id["o3"][0]["status"] == "completed"

    # o4: created→deleted→deleted — consecutive dedup keeps first 'deleted'
    o4 = sorted(by_id["o4"], key=lambda r: r["start_time"])
    assert [r["status"] for r in o4] == ["created", "deleted"]
    assert o4[1]["start_time"] == dt.datetime(2021, 3, 2, 7, 20)

    # o5: out-of-order 2019 event is just an interval starting in 2019
    assert by_id["o5"][0]["start_time"] == dt.datetime(2019, 12, 31, 23, 0)

    assert_scd2_invariants(dim, "id")
    dim.unpersist()


def _random_events(rng, n_keys=120):
    statuses = ["created", "paid", "shipped", "completed", "deleted"]
    rows = []
    for k in range(n_keys):
        t = dt.datetime(2021, 1, 1) + dt.timedelta(minutes=rng.randint(0, 10000))
        for _ in range(rng.randint(1, 12)):
            rows.append((f"k{k}", rng.choice(statuses), t))
            t += dt.timedelta(minutes=rng.randint(1, 500))
    return rows


def _rowset(df):
    return sorted(tuple(r) for r in df.collect())


def test_scd2_merge_events_equals_full_rebuild(spark):
    """Incremental merge over a time-split batch ≡ full-history rebuild,
    including keys that exist only in one batch and keys spanning both."""
    rng = random.Random(7)
    rows = _random_events(rng)
    cut = dt.datetime(2021, 1, 4)
    df = spark.createDataFrame(rows, "id string, status string, event_time timestamp")
    prior = scd2_merge_events(None, df.filter(F.col("event_time") < cut), "id", ["status"], "event_time")
    merged = scd2_merge_events(prior, df.filter(F.col("event_time") >= cut), "id", ["status"], "event_time")
    full = scd2_from_events(df, key="id", attr_cols=["status"], time_col="event_time")
    assert _rowset(merged) == _rowset(full)
    assert_scd2_invariants(merged, "id")


def test_scd2_merge_events_idempotent_and_late(spark):
    rng = random.Random(11)
    rows = _random_events(rng, n_keys=40)
    cut = dt.datetime(2021, 1, 4)
    df = spark.createDataFrame(rows, "id string, status string, event_time timestamp")
    batch1, batch2 = df.filter(F.col("event_time") < cut), df.filter(F.col("event_time") >= cut)
    dim = scd2_merge_events(scd2_merge_events(None, batch1, "id", ["status"], "event_time"),
                            batch2, "id", ["status"], "event_time")
    # re-delivering the same batch is a no-op
    again = scd2_merge_events(dim, batch2, "id", ["status"], "event_time")
    assert _rowset(again) == _rowset(dim)
    # LATE batch: feed batch2 first, then the earlier batch1 — out-of-order
    # events re-derive their keys exactly (reference's overlap quirk absent)
    late = scd2_merge_events(scd2_merge_events(None, batch2, "id", ["status"], "event_time"),
                             batch1, "id", ["status"], "event_time")
    full = scd2_from_events(df, key="id", attr_cols=["status"], time_col="event_time")
    assert _rowset(late) == _rowset(full)


def test_scd2_merge_events_untouched_keys_pass_through(spark):
    """A batch touching one key leaves every other key's rows byte-identical
    and only re-derives the touched key."""
    base = spark.createDataFrame(
        [("a", "created", dt.datetime(2021, 1, 1)), ("a", "paid", dt.datetime(2021, 1, 2)),
         ("b", "created", dt.datetime(2021, 1, 1))],
        "id string, status string, event_time timestamp",
    )
    dim = scd2_merge_events(None, base, "id", ["status"], "event_time")
    batch = spark.createDataFrame([("b", "completed", dt.datetime(2021, 1, 5))],
                                  "id string, status string, event_time timestamp")
    out = scd2_merge_events(dim, batch, "id", ["status"], "event_time")
    assert _rowset(out.filter(F.col("id") == "a")) == _rowset(dim.filter(F.col("id") == "a"))
    b_rows = sorted(out.filter(F.col("id") == "b").collect(), key=lambda r: r["start_time"])
    assert [r["status"] for r in b_rows] == ["created", "completed"]
    assert b_rows[0]["end_time"] == b_rows[1]["start_time"] == dt.datetime(2021, 1, 5)
    assert b_rows[1]["end_time"] == SENT


def test_scd2_merge_events_interior_late_event_contract(spark):
    """Documented approximation: an event landing strictly INSIDE a
    collapsed run re-splits it but cannot restore the absorbed repeat —
    while collapse_consecutive=False storage makes the same merge exact."""
    t1, t2, t3 = dt.datetime(2021, 1, 1), dt.datetime(2021, 1, 2), dt.datetime(2021, 1, 3)
    schema = "id string, status string, event_time timestamp"
    prior_events = spark.createDataFrame([("k", "X", t1), ("k", "X", t3)], schema)
    late = spark.createDataFrame([("k", "Y", t2)], schema)
    full = spark.createDataFrame([("k", "X", t1), ("k", "X", t3), ("k", "Y", t2)], schema)

    # collapsed dim: (X,t1),(X,t3) stored as one row — the interior Y@t2
    # splits it to X,Y but the X@t3 reversion is unrecoverable
    dim_c = scd2_merge_events(None, prior_events, "id", ["status"], "event_time")
    merged_c = scd2_merge_events(dim_c, late, "id", ["status"], "event_time")
    assert [r["status"] for r in sorted(merged_c.collect(), key=lambda r: r["start_time"])] == ["X", "Y"]
    rebuild = scd2_from_events(full, key="id", attr_cols=["status"], time_col="event_time")
    assert [r["status"] for r in sorted(rebuild.collect(), key=lambda r: r["start_time"])] == ["X", "Y", "X"]

    # uncollapsed storage keeps every event → merge ≡ rebuild exactly
    dim_u = scd2_merge_events(None, prior_events, "id", ["status"], "event_time",
                              collapse_consecutive=False)
    merged_u = scd2_merge_events(dim_u, late, "id", ["status"], "event_time",
                                 collapse_consecutive=False)
    rebuild_u = scd2_from_events(full, key="id", attr_cols=["status"], time_col="event_time",
                                 collapse_consecutive=False)
    assert _rowset(merged_u) == _rowset(rebuild_u)


def test_snapshot_merge_null_key_rows_are_retained(spark):
    """A NULL-key open dim row must survive the next merge (presence-marker
    classification), and a NULL-key snapshot row inserts with its values."""
    dim = spark.createDataFrame(
        [(None, "ghost", "t", Decimal("1.00"), dt.datetime(2021, 3, 1, 1), SENT),
         ("p1", "widget", "tools", Decimal("2.00"), dt.datetime(2021, 3, 1, 1), SENT)],
        "id string, title string, category string, price decimal(10,2), start_time timestamp, end_time timestamp",
    )
    snap = spark.createDataFrame(
        [("p1", "widget", "tools", Decimal("2.00")), (None, "new-ghost", "t2", Decimal("3.00"))],
        "id string, title string, category string, price decimal(10,2)",
    )
    out = scd2_snapshot_merge(dim, snap, key="id", attr_cols=ATTRS, ts="2021-03-02 01:00:00")
    rows = [r.asDict() for r in out.collect()]
    null_rows = sorted([r for r in rows if r["id"] is None], key=lambda r: r["start_time"])
    assert [r["title"] for r in null_rows] == ["ghost", "new-ghost"]  # retained + inserted
    assert all(r["end_time"] == SENT for r in null_rows)
    assert len([r for r in rows if r["id"] == "p1"]) == 1  # unchanged


def test_scd2_from_events_randomized_invariants(spark):
    """200 random keys × random event sequences in ONE Spark pass."""
    rng = random.Random(42)
    statuses = ["created", "paid", "shipped", "completed", "deleted"]
    rows = []
    for k in range(200):
        t = dt.datetime(2021, 1, 1) + dt.timedelta(minutes=rng.randint(0, 10000))
        for _ in range(rng.randint(1, 12)):
            rows.append((f"k{k}", rng.choice(statuses), t))
            # duplicates sometimes share the exact timestamp (duplicate delivery)
            if rng.random() < 0.2:
                rows.append((f"k{k}", rng.choice(statuses), t))
            t += dt.timedelta(minutes=rng.randint(1, 500))
    df = spark.createDataFrame(rows, "id string, status string, event_time timestamp")
    dim = scd2_from_events(df, key="id", attr_cols=["status"], time_col="event_time").cache()

    assert_scd2_invariants(dim, "id")
    # every key present, first interval starts at the key's earliest event
    firsts = df.groupBy("id").agg(F.min("event_time").alias("min_t"))
    first_iv = dim.groupBy("id").agg(F.min("start_time").alias("s0"))
    mismatches = firsts.join(first_iv, "id").filter(F.col("min_t") != F.col("s0")).count()
    assert mismatches == 0
    # no two consecutive intervals share the same status (collapse worked)
    w = Window.partitionBy("id").orderBy("start_time")
    runs = dim.withColumn("prev", F.lag("status").over(w)).filter(F.col("status").eqNullSafe(F.col("prev"))).count()
    assert runs == 0
    dim.unpersist()
