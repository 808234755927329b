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
