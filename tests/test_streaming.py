"""Structured Streaming ingestion tests: availableNow drain, checkpoint
idempotency, watermarked windowed aggregation."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from batch_data_pipeline_exercise_spark.streaming import ingest

FIX = "tests/fixtures"


@pytest.fixture()
def stream_dirs(tmp_path):
    raw = tmp_path / "raw"
    raw.mkdir()
    shutil.copy(f"{FIX}/orders_2021-03-02.csv", raw / "orders_2021-03-02.csv")
    return str(raw), str(tmp_path / "bronze"), str(tmp_path / "ckpt")


def test_stream_bronze_availablenow_and_idempotency(spark, stream_dirs):
    raw, bronze, ckpt = stream_dirs

    q = ingest.write_bronze(ingest.stream_order_events(spark, raw), bronze, ckpt)
    q.awaitTermination(120)
    out = spark.read.parquet(bronze)
    # 9 fixture rows minus 2 exact duplicate deliveries that share (id, event_time)
    assert out.count() == 8
    assert "event_date" in out.columns  # date-partitioned sink

    # re-run with the same checkpoint: nothing new → no duplicates
    q2 = ingest.write_bronze(ingest.stream_order_events(spark, raw), bronze, ckpt)
    q2.awaitTermination(120)
    assert spark.read.parquet(bronze).count() == 8

    # a new daily drop is picked up incrementally
    with open(f"{raw}/orders_2021-03-03.csv", "w") as f:
        f.write("id,productId,amount,totalPrice,status,timestamp\n")
        f.write("o9,p1,1,19.99,created,2021-03-03 09:00:00\n")
    q3 = ingest.write_bronze(ingest.stream_order_events(spark, raw), bronze, ckpt)
    q3.awaitTermination(120)
    assert spark.read.parquet(bronze).count() == 9


def test_streaming_windowed_agg(spark, stream_dirs, tmp_path):
    raw, _, _ = stream_dirs
    agg = ingest.streaming_status_counts(spark, raw)
    q = (
        agg.writeStream.format("memory")
        .queryName("status_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {(str(r["day"]), r["status"]): r["event_count"] for r in spark.sql("SELECT * FROM status_counts").collect()}
    assert rows[("2021-03-01", "created")] == 2  # o1, o2 (dup suppressed)
    assert rows[("2021-03-02", "deleted")] == 2  # distinct-ts repeats both count ((id, ts) is the dedup key)
    assert rows[("2019-12-31", "created")] == 1  # years-late event still lands in its window


def test_stateful_order_summary(spark, stream_dirs):
    from batch_data_pipeline_exercise_spark.streaming.stateful import order_state_stream

    raw, _, _ = stream_dirs
    ev = ingest.stream_order_events(spark, raw).select("id", "status", "event_time")
    out = order_state_stream(ev)
    q = (
        out.writeStream.format("memory")
        .queryName("order_state")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = {r["id"]: r for r in spark.sql("SELECT * FROM order_state").collect()}
    assert rows["o1"]["n_events"] == 2 and rows["o1"]["last_status"] == "completed"
    assert rows["o2"]["n_events"] == 1  # duplicate delivery suppressed upstream
    assert rows["o4"]["n_events"] == 3 and rows["o4"]["last_status"] == "deleted"
    assert str(rows["o5"]["first_ts"]).startswith("2019-12-31")


def test_streaming_session_window(spark, stream_dirs):
    raw, _, _ = stream_dirs
    out = ingest.streaming_sessions(spark, raw, gap="30 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("sessions")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM sessions").collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r["id"], []).append(r)
    # o1: events 90 min apart -> two separate sessions
    assert len(by_id["o1"]) == 2
    # o4: three events within 10 minutes -> one session of 3
    assert len(by_id["o4"]) == 1 and by_id["o4"][0]["n_events"] == 3


def test_stream_static_join_enrichment(spark, stream_dirs, tmp_path):
    raw, _, _ = stream_dirs
    dim = spark.createDataFrame(
        [("p1", "widget"), ("p2", "gadget"), ("p3", "gizmo"), ("p4", "doohickey")],
        "product_id string, product_name string",
    )
    out_dir, ckpt = str(tmp_path / "enr"), str(tmp_path / "enr_ckpt")
    q = (
        ingest.stream_enriched_orders(spark, raw, dim)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.read.parquet(out_dir)
    assert out.count() == 8
    named = {r["product_id"]: r["product_name"] for r in out.collect()}
    assert named["p1"] == "widget" and named["p4"] == "doohickey"
    assert named["p9"] is None  # left join keeps dim-less events


def test_stream_foreachbatch_upsert(spark, stream_dirs, tmp_path):
    from batch_data_pipeline_exercise_spark.sources.warehouse import Warehouse

    raw, _, _ = stream_dirs
    wh = Warehouse(spark, str(tmp_path / "wh"))
    ckpt = str(tmp_path / "up_ckpt")

    q = ingest.upsert_order_state(spark, raw, wh, ckpt)
    q.awaitTermination(120)
    state = {r["id"]: r["status"] for r in wh.read("silver_orders").collect()}
    assert state == {"o1": "completed", "o2": "created", "o3": "completed", "o4": "deleted", "o5": "created"}

    # re-run same checkpoint: committed batch skipped, state unchanged
    q2 = ingest.upsert_order_state(spark, raw, wh, ckpt)
    q2.awaitTermination(120)
    assert wh.read("silver_orders").count() == 5

    # new drop updates o5 and inserts o9 — upsert, not append
    with open(f"{raw}/orders_2021-03-03.csv", "w") as f:
        f.write("id,productId,amount,totalPrice,status,timestamp\n")
        f.write("o5,p4,1,42.00,completed,2021-03-03 09:00:00\n")
        f.write("o9,p1,1,19.99,created,2021-03-03 09:00:00\n")
    q3 = ingest.upsert_order_state(spark, raw, wh, ckpt)
    q3.awaitTermination(120)
    after = {r["id"]: r["status"] for r in wh.read("silver_orders").collect()}
    assert after["o5"] == "completed" and after["o9"] == "created" and len(after) == 6

    # replaying everything from a FRESH checkpoint converges (merge idempotency)
    q4 = ingest.upsert_order_state(spark, raw, wh, str(tmp_path / "up_ckpt2"))
    q4.awaitTermination(120)
    replay = {r["id"]: r["status"] for r in wh.read("silver_orders").collect()}
    assert replay == after


def test_upsert_cross_batch_equal_timestamp_converges(spark, tmp_path):
    """Same-timestamp events split across DIFFERENT micro-batches must
    resolve by the (event_time, status) total order, not arrival order:
    the incremental result has to equal a fresh-checkpoint replay."""
    from batch_data_pipeline_exercise_spark.sources.warehouse import Warehouse

    raw = tmp_path / "raw"
    raw.mkdir()
    hdr = "id,productId,amount,totalPrice,status,timestamp\n"
    # batch 1: the LATER-sorting status arrives first
    (raw / "orders_b1.csv").write_text(hdr + "oX,p1,1,10.00,deleted,2021-03-01 10:00:00\n")
    wh = Warehouse(spark, str(tmp_path / "wh"))
    ingest.upsert_order_state(spark, str(raw), wh, str(tmp_path / "c1")).awaitTermination(120)
    # batch 2: equal timestamp, smaller status — must NOT overwrite
    (raw / "orders_b2.csv").write_text(hdr + "oX,p1,1,10.00,created,2021-03-01 10:00:00\n")
    ingest.upsert_order_state(spark, str(raw), wh, str(tmp_path / "c1")).awaitTermination(120)
    incremental = {r["id"]: r["status"] for r in wh.read("silver_orders").collect()}
    assert incremental == {"oX": "deleted"}


def test_upsert_merge_unfreezes_null_timestamp_rows(spark, tmp_path):
    """A stored row whose first arrival had an unparseable (NULL)
    event_time must still accept later timestamped updates — without
    the IS NULL arm the merge condition is NULL and the row freezes."""
    from pyspark.sql import functions as F

    from batch_data_pipeline_exercise_spark.operators.merge import merge_into

    target = spark.createDataFrame(
        [("o1", "created", None)], "id string, status string, event_time timestamp"
    )
    source = spark.createDataFrame(
        [("o1", "completed", "2021-03-01 00:00:00")],
        "id string, status string, event_time string",
    ).withColumn("event_time", F.col("event_time").cast("timestamp"))
    merged = merge_into(
        target,
        source,
        key="id",
        update_set={"status": F.col("s.status"), "event_time": F.col("s.event_time")},
        update_condition=(
            F.col("t.event_time").isNull()
            | (F.col("s.event_time") > F.col("t.event_time"))
            | (
                (F.col("s.event_time") == F.col("t.event_time"))
                & (F.col("s.status") >= F.col("t.status"))
            )
        ),
    )
    row = merged.collect()[0]
    assert row["status"] == "completed" and row["event_time"] is not None


def test_tws_order_summary_matches_classic(spark, stream_dirs):
    """transformWithStateInPandas twin: same per-order summary as the
    applyInPandasWithState operator on the same drop (requires the
    RocksDB state store provider AND protobuf, which the TWS state
    protocol speaks — skip where the container lacks it)."""
    pytest.importorskip("google.protobuf.descriptor")
    from batch_data_pipeline_exercise_spark.streaming import tws

    raw, _, _ = stream_dirs
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", tws.ROCKSDB_PROVIDER)
    try:
        ev = ingest.stream_order_events(spark, raw).select("id", "status", "event_time")
        out = tws.order_state_stream_tws(ev)
        q = (
            out.writeStream.format("memory")
            .queryName("order_state_tws")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        got = {tuple(r) for r in spark.sql("SELECT * FROM order_state_tws").collect()}
        # REAL parity: run the classic twin on the same drop and diff
        # the full row sets
        from batch_data_pipeline_exercise_spark.streaming.stateful import order_state_stream

        q2 = (
            order_state_stream(ev)
            .writeStream.format("memory")
            .queryName("order_state_classic")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q2.awaitTermination(180)
        expected = {tuple(r) for r in spark.sql("SELECT * FROM order_state_classic").collect()}
        assert got == expected and len(got) >= 5
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_tws_liststate_recent_events_matches_batch(spark, stream_dirs):
    """ListState twin: per-order last-3 events from the stream must equal
    the batch window computation on the same drop — the bounded-buffer
    property (state is O(K) per key) plus ordering/NaT discipline."""
    pytest.importorskip("google.protobuf.descriptor")
    from batch_data_pipeline_exercise_spark.streaming import tws

    raw, _, _ = stream_dirs
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", tws.ROCKSDB_PROVIDER)
    try:
        ev = ingest.stream_order_events(spark, raw).select("id", "status", "event_time")
        q = (
            tws.recent_events_stream_tws(ev)
            .writeStream.format("memory")
            .queryName("recent_tws")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        got = {tuple(r) for r in spark.sql("SELECT * FROM recent_tws").collect()}

        from pyspark.sql.window import Window

        # mirror the stream path's duplicate-delivery suppression
        # (stream_order_events drops on (id, event_time))
        batch = (
            spark.read.format("csv")
            .option("header", True)
            .load(raw)
            .select(
                F.col("id"),
                F.col("status"),
                F.to_timestamp("timestamp").alias("event_time"),
            )
            .dropDuplicates(["id", "event_time"])
            .filter(F.col("event_time").isNotNull())
        )
        w = Window.partitionBy("id").orderBy(F.col("event_time").desc(), F.col("status").desc())
        expected = {
            tuple(r)
            for r in batch.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= tws.RECENT_K)
            .groupBy("id")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_recent"),
                F.concat_ws(
                    ",",
                    F.reverse(
                        F.transform(
                            F.sort_array(
                                F.collect_list(F.struct("event_time", "status")), asc=False
                            ),
                            lambda s: s["status"],
                        )
                    ),
                ).alias("recent_statuses"),
            )
            .collect()
        }
        assert got == expected and len(got) >= 3
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_tws_mapstate_status_counts_matches_batch(spark, stream_dirs):
    """MapState twin: per-(order, status) counts from the stream equal the
    batch groupBy on the same drop (after the stream's (id, event_time)
    duplicate suppression)."""
    pytest.importorskip("google.protobuf.descriptor")
    from batch_data_pipeline_exercise_spark.streaming import tws

    raw, _, _ = stream_dirs
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", tws.ROCKSDB_PROVIDER)
    try:
        ev = ingest.stream_order_events(spark, raw).select("id", "status", "event_time")
        q = (
            tws.status_counts_stream_tws(ev)
            .writeStream.format("memory")
            .queryName("status_tws")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        got = {tuple(r) for r in spark.sql("SELECT * FROM status_tws").collect()}
        expected = {
            tuple(r)
            for r in spark.read.format("csv")
            .option("header", True)
            .load(raw)
            .select("id", "status", F.to_timestamp("timestamp").alias("event_time"))
            .dropDuplicates(["id", "event_time"])
            .groupBy("id", "status")
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
            .collect()
        }
        assert got == expected and len(got) >= 5
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_tws_eventtime_timer_silence_detection(spark, stream_dirs, tmp_path):
    """Event-time timer exemplar: one silence row per key once the
    WATERMARK passes last_event + 30 min — the timeout/abandonment
    trigger only timers can express (it fires on the absence of data).
    Drains twice with one checkpoint: timers are fired by watermark
    advance, so a second availableNow run flushes any timer the first
    run's final no-data batch left pending — the same idempotent-replay
    discipline as every other streaming test here."""
    pytest.importorskip("google.protobuf.descriptor")
    from batch_data_pipeline_exercise_spark import schemas
    from batch_data_pipeline_exercise_spark.streaming import tws

    raw, _, _ = stream_dirs
    out, ckpt = str(tmp_path / "silence"), str(tmp_path / "silence_ckpt")
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", tws.ROCKSDB_PROVIDER)
    try:
        def drain():
            ev = (
                spark.readStream.schema(schemas.ORDER_EVENTS_FEED)
                .option("header", True)
                .csv(raw)
                .select("id", "status", F.to_timestamp("timestamp").alias("event_time"))
                .withWatermark("event_time", "0 seconds")
            )
            q = (
                tws.silent_orders_stream_tws(ev)
                .writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", ckpt)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(180)

        drain()
        drain()
        rows = {r["id"]: r for r in spark.read.parquet(out).collect()}
        # watermark ends at o4's last event: every other key has been
        # silent > 30 min and MUST have fired exactly once; o4 is still
        # inside its quiet-period watch (deadline 07:55 > wm 07:25)
        assert "o4" not in rows
        assert set(rows) == {"o1", "o2", "o3", "o5"}
        o1 = rows["o1"]
        assert str(o1["start_ts"]).startswith("2021-03-01 08:00") and o1["n_events"] == 2
        assert rows["o2"]["n_events"] == 2  # raw feed: duplicate delivery counted
        assert str(rows["o5"]["end_ts"]).startswith("2019-12-31")  # years-late key still times out by event time
        # one row per key per quiet period — no duplicates across drains
        assert spark.read.parquet(out).count() == 4
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
