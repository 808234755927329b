"""Structured Streaming ingestion — the optional lift of the reference's
daily batch feeds onto a streaming runtime (SURVEY.md §2.9).

The reference is strictly batch; these entry points keep its exact
semantics while swapping the arrival mechanism: a file-source stream with
``Trigger.AvailableNow`` processes whatever daily drops exist and stops —
the streaming-native equivalent of "run the DAG for each pending ds" —
with checkpointed exactly-once sinks replacing the anti-join idempotency
dance. Late/duplicate handling maps to watermark + ``dropDuplicates``
(reference contract: (id, timestamp) unique, events may arrive years
late → long watermark).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from batch_data_pipeline_exercise_spark import schemas


def stream_order_events(
    spark: SparkSession,
    raw_dir: str,
    watermark: str | None = None,
) -> DataFrame:
    """Streaming read of order-event CSV drops (``orders_*.csv``) with
    duplicate-delivery suppression.

    ``watermark=None`` (default) matches BATCH semantics exactly: the
    reference's events can arrive YEARS late (its 2020-05-23 sample holds
    2018 timestamps), and any finite watermark would silently drop such
    backfills that ``Pipeline.run_orders`` keeps. The cost is unbounded
    dedup state — pass a watermark only when late arrivals are genuinely
    bounded and state size matters.

    Returns an unbounded DataFrame; pair with ``write_bronze`` to land it.
    """
    stream = (
        spark.readStream.schema(schemas.ORDER_EVENTS_FEED)
        .option("header", True)
        .option("pathGlobFilter", "orders_*.csv")
        .csv(raw_dir)
        .withColumnRenamed("productId", "product_id")
        .withColumnRenamed("totalPrice", "total_price")
        .withColumnRenamed("timestamp", "event_time")
        .withColumn("processed_time", F.current_timestamp())
    )
    if watermark is None:
        return stream.dropDuplicates(["id", "event_time"])
    return stream.withWatermark("event_time", watermark).dropDuplicatesWithinWatermark(["id", "event_time"])


def write_bronze(
    events: DataFrame,
    bronze_path: str,
    checkpoint_path: str,
    available_now: bool = True,
):
    """Land the stream as the bronze event log (parquet, date-partitioned).

    ``Trigger.AvailableNow`` drains pending files then stops — the
    batch-compatible mode; exactly-once via the checkpoint, so re-runs are
    no-ops (the streaming analog of M3 idempotency). Returns the started
    ``StreamingQuery``; callers ``awaitTermination()``.
    """
    writer = (
        events.withColumn("event_date", F.to_date("event_time"))
        .writeStream.format("parquet")
        .option("path", bronze_path)
        .option("checkpointLocation", checkpoint_path)
        .partitionBy("event_date")
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_sessions(
    spark: SparkSession,
    raw_dir: str,
    gap: str = "30 minutes",
    watermark: str | None = None,
) -> DataFrame:
    """Native event-time sessionization: ``session_window`` groups events
    into variable-length windows closed after ``gap`` of inactivity —
    the streaming counterpart of the batch lag+cumsum sessionizer
    (contract query ``user_sessions``)."""
    ev = stream_order_events(spark, raw_dir, watermark)
    return (
        ev.groupBy(F.session_window("event_time", gap).alias("w"), "id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def streaming_status_counts(
    spark: SparkSession,
    raw_dir: str,
    watermark: str | None = None,
    window_duration: str = "1 day",
) -> DataFrame:
    """Windowed event-time aggregation over the order feed: per-day counts
    per status, late data folded in until the watermark closes the window.
    Demonstrates the watermarked-agg operator surface; collect via a
    memory/parquet sink with availableNow."""
    ev = stream_order_events(spark, raw_dir, watermark)
    return (
        ev.groupBy(F.window("event_time", window_duration).alias("w"), "status")
        .agg(F.count(F.lit(1)).alias("event_count"))
        .select(F.col("w.start").cast("date").alias("day"), "status", "event_count")
    )


def stream_enriched_orders(
    spark: SparkSession,
    raw_dir: str,
    dim: DataFrame,
    on: str = "product_id",
    watermark: str | None = None,
) -> DataFrame:
    """Stream-static join: the order-event stream enriched against a
    batch dimension table. Spark re-plans the static side per micro-batch
    (so a dim refreshed between batches is picked up) and broadcasts it —
    the canonical fact-stream x dim shape; no state, no watermark
    required. Left join keeps events whose dim row is missing (late dim
    arrival), mirroring the batch pipeline's tolerance."""
    ev = stream_order_events(spark, raw_dir, watermark)
    return ev.join(F.broadcast(dim), on, "left")


def upsert_order_state(
    spark: SparkSession,
    raw_dir: str,
    warehouse,
    checkpoint_path: str,
    table: str = "silver_orders",
    watermark: str | None = None,
):
    """Streaming upsert into the warehouse via ``foreachBatch``: each
    micro-batch reduces to its latest event per order id, then MERGEs
    into the silver table — newer-event-wins update, insert when absent.

    "Latest" is the MAX of ``(event_time, status)`` under lexicographic
    order — the same total order applied both within a batch (window
    rank) and across batches (the merge's update condition), so the
    final state is independent of how events were sliced into
    micro-batches: an incremental run and a fresh-checkpoint replay
    converge to the identical table. (event_time alone would leave
    equal-timestamp events across different batches to last-processed-
    wins nondeterminism; the upstream (id, event_time) dedup only guards
    within the stream, not against the stored table.)

    Exactly-once effect from at-least-once machinery: the checkpoint
    skips fully-committed batches, and the MERGE itself is idempotent
    (replaying a batch converges to the same table), so a crash between
    sink commit and checkpoint write cannot duplicate or regress state —
    the streaming generalization of the reference's UPDATE-then-INSERT
    upsert (process_orders_sqls.py:29-50). Returns the started query.
    """
    from batch_data_pipeline_exercise_spark.operators.merge import merge_into

    ev = stream_order_events(spark, raw_dir, watermark)
    data_cols = ["product_id", "amount", "total_price", "status", "event_time"]

    def _upsert(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql.window import Window

        w = Window.partitionBy("id").orderBy(F.col("event_time").desc(), F.col("status").desc())
        latest = (
            batch_df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select("id", *data_cols)
        )
        if warehouse.exists(table):
            merged = merge_into(
                warehouse.read(table),
                latest,
                key="id",
                update_set={c: F.col(f"s.{c}") for c in data_cols},
                update_condition=(
                    # a stored NULL event_time (unparseable first arrival)
                    # must always lose to a timestamped update: without
                    # the IS NULL arm both comparisons are NULL and the
                    # merge would freeze the order in its broken state
                    F.col("t.event_time").isNull()
                    | (F.col("s.event_time") > F.col("t.event_time"))
                    | (
                        (F.col("s.event_time") == F.col("t.event_time"))
                        & (F.col("s.status") >= F.col("t.status"))
                    )
                ),
                assert_unique_source_key=True,
            )
            warehouse.overwrite(merged, table)
        else:
            warehouse.overwrite(latest, table)

    return (
        ev.writeStream.foreachBatch(_upsert)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
