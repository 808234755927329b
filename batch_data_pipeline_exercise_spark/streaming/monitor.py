"""Streaming ingestion-volume monitoring: fold event drops into daily
count deltas, report trailing-window anomalies.

The streaming face of ``operators/robust.trailing_count_anomalies``: a
100 TB ingest wants its volume canary ON the stream, not in a nightly
batch. Each micro-batch reduces to per-(event_type, day) count DELTAS —
tiny against the raw stream — and appends them with ``batch_id``
provenance; the report folds deltas into daily totals (cost scales with
stored groups, never ingested rows) and applies the exact integer
z-score test.

Idempotency is delta-replay-safe rather than row-dedup: a replayed
micro-batch (crash between sink commit and checkpoint write) first
deletes its own ``batch_id`` rows, then re-appends the deterministic
delta — the overwrite-by-provenance pattern, cheaper than keeping a
processed-event-id set. ``compact_deltas`` folds fully-committed
history into one row per group (batch_id −1) on the maintenance
cadence, bounding the delta table at any horizon.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from batch_data_pipeline_exercise_spark.operators.robust import trailing_count_anomalies

EVENTS_SCHEMA = "event_id BIGINT, ts TIMESTAMP, event_type STRING"


def stream_events(spark: SparkSession, raw_dir: str) -> DataFrame:
    """Streaming read of event JSONL drops (``events_*.jsonl``)."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("pathGlobFilter", "events_*.jsonl")
        .json(raw_dir)
    )


def streaming_volume_monitor(
    spark: SparkSession,
    raw_dir: str,
    warehouse,
    checkpoint_path: str,
    deltas_table: str = "event_count_deltas",
):
    """Start an availableNow stream folding event drops into the daily
    count-delta table. Returns the started query.

    The batch body is deterministic (a pure aggregate of the batch) and
    provenance-keyed, so replaying a batch UNDER THE SAME CHECKPOINT —
    the crash-between-commit-and-checkpoint case — converges:
    delete-own-batch-id + append is idempotent. The deltas table and
    the checkpoint share a lifetime: a rebuild from a FRESH checkpoint
    must start from an empty deltas table too (batch slicing can
    differ, and provenance ids only align within one checkpoint
    lineage). Counts cannot be content-deduped without storing every
    event id; provenance keying is the scalable trade.
    """
    ev = stream_events(spark, raw_dir)

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        # dropDuplicates treats NULLs as EQUAL: a malformed drop where
        # many rows lack event_id would collapse them all to one row and
        # undercount precisely when the volume canary matters most —
        # dedup only identified rows, pass NULL-id rows through intact
        with_id = batch_df.filter(F.col("event_id").isNotNull()).dropDuplicates(["event_id"])
        no_id = batch_df.filter(F.col("event_id").isNull())
        delta = (
            with_id.unionByName(no_id)
            .groupBy(
                "event_type",
                F.unix_date(F.col("ts").cast("date")).cast("bigint").alias("d"),
            )
            .agg(F.count(F.lit(1)).alias("cnt"))
            .withColumn("batch_id", F.lit(batch_id).cast("bigint"))
        )
        if not warehouse.exists(deltas_table):
            warehouse.overwrite(delta, deltas_table)
            return
        # normal path: plain append — O(batch). The full read+rewrite is
        # paid ONLY on actual replay (a bounded limit(1) probe detects
        # the batch_id), so per-batch cost does not grow with history
        replayed = (
            warehouse.read(deltas_table)
            .filter(F.col("batch_id") == batch_id)
            .limit(1)
            .count()
            > 0
        )
        if replayed:
            kept = warehouse.read(deltas_table).filter(F.col("batch_id") != batch_id)
            warehouse.overwrite(kept.unionByName(delta).localCheckpoint(), deltas_table)
        else:
            warehouse.append(delta, deltas_table)

    return (
        ev.writeStream.foreachBatch(_fold)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def daily_counts(warehouse, deltas_table: str = "event_count_deltas") -> DataFrame:
    """Fold deltas into per-(event_type, day) totals."""
    return (
        warehouse.read(deltas_table)
        .groupBy("event_type", "d")
        .agg(F.sum("cnt").alias("cnt"))
    )


def anomaly_report(
    warehouse,
    deltas_table: str = "event_count_deltas",
    window: int = 7,
    z: int = 3,
    min_points: int = 3,
) -> DataFrame:
    """Trailing-window anomaly flags over the folded daily counts —
    identical semantics to the batch ``daily_event_anomaly_flags``
    contract query, so streaming and batch agree on the same data."""
    return trailing_count_anomalies(
        daily_counts(warehouse, deltas_table),
        ["event_type"],
        "d",
        "cnt",
        window=window,
        z=z,
        min_points=min_points,
    )


def compact_deltas(warehouse, deltas_table: str = "event_count_deltas") -> None:
    """Fold the accumulated delta rows into one row per (event_type, day)
    under the reserved batch_id −1 — bounding the table at any horizon.
    Safe once the folded batches are checkpoint-committed (they can no
    longer replay); a replay of an UNcommitted batch after compaction
    would double-count, so run this from the maintenance cadence, not
    concurrently with the stream."""
    folded = (
        warehouse.read(deltas_table)
        .groupBy("event_type", "d")
        .agg(F.sum("cnt").alias("cnt"))
        .withColumn("batch_id", F.lit(-1).cast("bigint"))
        .localCheckpoint()
    )
    warehouse.overwrite(folded, deltas_table)
