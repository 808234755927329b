"""Streaming KMV (k-minimum-values) distinct-sketch maintenance.

The batch query ``event_type_user_overlap_kmv`` (plans/contract5.py)
shows KMV's payoff — set-INTERSECTION estimates HLL cannot give. This
module maintains the per-group k-min hash sets INCREMENTALLY from an
event stream, because KMV is a lattice fold: the k smallest of
(stored ∪ batch) equals the k smallest of the full history, for ANY
batch slicing. That exactness (not approximation — the sketch bytes are
identical) is what ``tests/test_streaming_kmv.py`` pins.

State per group is at most ``k`` rows of (group, h), so report cost and
stored size are bounded by groups x k forever, no matter how many
billions of events have streamed through — the same bounded-state
argument as ``operators/sketches.py``'s HLL union-agg, with the added
property that two stored sketch tables for disjoint event ranges merge
by the SAME fold (union → rank → keep k).

Hash: the md5-derived 60-bit key used by the batch query, so a sketch
maintained here is directly comparable with (and bit-identical to) one
computed from scratch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from batch_data_pipeline_exercise_spark.operators.sketches import KMV_H, kmv_hash

EVENTS_SCHEMA = "event_id BIGINT, user_id BIGINT, event_type STRING"


def fold_kmv(
    prior: DataFrame | None,
    batch: DataFrame,
    group_col: str,
    id_col: str,
    k: int = 64,
) -> DataFrame:
    """Fold a batch of (group, id) rows into the stored k-min table.

    Output: (group_col, h) — at most k rows per group, the k smallest
    distinct hashes over everything ever folded. Associative and
    idempotent: re-folding rows already represented changes nothing,
    and any batch slicing yields the same table.
    """
    # NULL ids produce NULL hashes that would sort FIRST and permanently
    # occupy a k-min slot (an evicted hash can never return) — drop them
    new = (
        batch.filter(F.col(id_col).isNotNull())
        .select(F.col(group_col), kmv_hash(id_col).alias("h"))
        .distinct()
    )
    allrows = new if prior is None else new.unionByName(prior.select(group_col, "h")).distinct()
    w = Window.partitionBy(group_col).orderBy("h")
    return (
        allrows.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def kmv_estimates(stored: DataFrame, group_col: str, k: int = 64) -> DataFrame:
    """Per-group distinct-count estimates from a stored k-min table:
    exact count below k (every hash retained), else (k-1) * H / theta.
    One fixed double expression — deterministic, oracle-compatible."""
    cnt = F.count(F.lit(1))
    return stored.groupBy(group_col).agg(
        cnt.alias("k_used"),
        F.when(cnt < k, cnt.cast("double"))
        .otherwise((cnt - 1).cast("double") * F.lit(KMV_H) / F.max("h").cast("double"))
        .alias("distinct_est"),
    )


def stream_events(spark: SparkSession, raw_dir: str) -> DataFrame:
    """Streaming read of event JSONL drops (``events_*.jsonl``)."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("pathGlobFilter", "events_*.jsonl")
        .json(raw_dir)
    )


def streaming_kmv_reach(
    spark: SparkSession,
    raw_dir: str,
    warehouse,
    checkpoint_path: str,
    sketch_table: str = "kmv_user_sketch",
    group_col: str = "event_type",
    id_col: str = "user_id",
    k: int = 64,
):
    """availableNow stream folding event drops into the per-group KMV
    sketch table. Returns the started query. The stored table carries
    the ``k`` it was built with; folding with a different ``k`` raises
    (a larger k cannot recover already-discarded hashes, so the
    "exact below k" branch of the estimator would silently lie).

    The fold is idempotent (duplicate events contribute existing hashes,
    which the distinct + rank drop), so replay after a crash between the
    overwrite and the checkpoint commit converges to the same table —
    the same exactly-once-effect argument as the dedup stream.
    """
    events = stream_events(spark, raw_dir)

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        prior = None
        if warehouse.exists(sketch_table):
            prior = warehouse.read(sketch_table)
            stored_k = prior.select("k").first()
            if stored_k is not None and stored_k["k"] != k:
                # raising k cannot resurrect hashes the stored sketch
                # already discarded: the estimate would silently claim
                # exactness over a truncated set. Refuse.
                raise ValueError(
                    f"sketch table {sketch_table!r} was built with k={stored_k['k']}; "
                    f"refusing to fold with k={k}"
                )
            prior = prior.select(group_col, "h")
        updated = fold_kmv(prior, batch_df, group_col, id_col, k)
        warehouse.overwrite(updated.withColumn("k", F.lit(k)), sketch_table)

    return (
        events.writeStream.foreachBatch(_fold)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
