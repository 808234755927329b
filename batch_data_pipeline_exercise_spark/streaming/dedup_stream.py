"""Streaming incremental near-dup detection: the batch-over-batch LSH
index probe (``operators/dedup.py incremental_minhash_pairs``) driven by
Structured Streaming's ``foreachBatch``.

This is the shape a 100 TB corpus actually ingests with: documents land
continuously, each micro-batch pays the shingle/minhash cost for ITS
rows only, probes the persisted band-key index with one equi join, and
leaves behind (a) the accumulated near-dup pair table and (b) the
updated index. History is never re-hashed.

Exactly-once effect from at-least-once machinery, same argument as
``ingest.upsert_order_state``: the checkpoint skips fully-committed
batches, and the batch body is idempotent — pairs append through an
anti-join on the pair key, the index update anti-joins on doc id — so a
crash between sink commit and checkpoint write cannot duplicate pairs
or index rows on replay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from batch_data_pipeline_exercise_spark.operators import dedup

DOCS_SCHEMA = "doc_id BIGINT, text STRING"


def stream_documents(spark: SparkSession, raw_dir: str) -> DataFrame:
    """Streaming read of document JSONL drops (``docs_*.jsonl``)."""
    return (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("pathGlobFilter", "docs_*.jsonl")
        .json(raw_dir)
    )


def streaming_incremental_dedup(
    spark: SparkSession,
    raw_dir: str,
    warehouse,
    checkpoint_path: str,
    index_table: str = "lsh_band_index",
    pairs_table: str = "near_dup_pairs",
    k: int = 32,
    bands: int = 8,
):
    """Start an availableNow stream that folds document drops into the
    near-dup pair table and band-key index. Returns the started query.

    Within one micro-batch the docs self-join (new × new) AND probe the
    stored index (new × prior); both candidate sets are emitted with
    ``batch_id`` provenance. Re-running with the same checkpoint is a
    no-op; replaying a batch after a crash converges to the same tables
    (anti-join idempotency on both writes).
    """
    docs = stream_documents(spark, raw_dir)

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        # drop NULL ids (the anti-join replay guard cannot match NULL,
        # so they would re-append on every crash replay) and duplicate
        # doc ids WITHIN the batch (at-least-once file listing can hand
        # the same row twice); prior-index membership handles duplicates
        # ACROSS batches below
        batch = batch_df.filter(F.col("doc_id").isNotNull()).dropDuplicates(["doc_id"])
        prior = warehouse.read(index_table) if warehouse.exists(index_table) else None
        if prior is not None:
            # replay guard: a doc already in the index contributes no new
            # keys (its pairs were emitted when it first arrived)
            batch = batch.join(prior.select(F.col("id").alias("doc_id")).distinct(), "doc_id", "left_anti")
        pairs, updated = dedup.incremental_minhash_pairs(prior, batch, "doc_id", k=k, bands=bands)
        pairs = pairs.withColumn("batch_id", F.lit(batch_id))
        if warehouse.exists(pairs_table):
            existing = warehouse.read(pairs_table).select("id1", "id2")
            fresh = pairs.join(existing, ["id1", "id2"], "left_anti")
            warehouse.append(fresh, pairs_table)
        else:
            warehouse.overwrite(pairs, pairs_table)
        # index rows are immutable and the batch is disjoint from prior
        # (anti-join above), so APPEND the batch's keys instead of
        # rewriting the whole history each micro-batch — per-batch index
        # IO is O(batch), which is the entire point of the incremental
        # fold (novelty_stream's append-only protocol, applied here)
        if prior is not None:
            fresh_keys = updated.join(batch.select(F.col("doc_id").alias("id")), "id", "semi")
            warehouse.append(fresh_keys, index_table)
        else:
            warehouse.overwrite(updated, index_table)

    return (
        docs.writeStream.foreachBatch(_fold)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


# ---------------------------------------------------------------------------
# Embedding-space twin: streaming semantic near-dup fold
# ---------------------------------------------------------------------------

EMB_SCHEMA = "vec_id BIGINT, embedding ARRAY<DOUBLE>"


def stream_embeddings(spark: SparkSession, raw_dir: str) -> DataFrame:
    """Streaming read of embedding JSONL drops (``vecs_*.jsonl``)."""
    return (
        spark.readStream.schema(EMB_SCHEMA)
        .option("pathGlobFilter", "vecs_*.jsonl")
        .json(raw_dir)
    )


def streaming_embedding_dedup(
    spark: SparkSession,
    raw_dir: str,
    warehouse,
    checkpoint_path: str,
    dim: int,
    index_table: str = "sign_sketch_index",
    pairs_table: str = "embedding_near_dups",
    threshold: float = 0.95,
    bands: int = 8,
    rows_per_band: int = 8,
    seed: int = 42,
):
    """Start an availableNow stream folding embedding drops into the
    verified near-dup pair table and the persisted sign-sketch index —
    ``streaming_incremental_dedup``'s embedding-space twin, with the same
    exactly-once-effect argument (checkpoint skips committed batches;
    pair/index writes are anti-join idempotent, so crash replay
    converges). Each micro-batch sketches ITS vectors only and probes
    the stored index with band-key equi joins; history is never
    re-folded. ``dim`` is required: inferring it would ``first()`` the
    micro-batch, and an empty replay batch must stay a no-op."""
    from batch_data_pipeline_exercise_spark.operators import similarity

    vecs = stream_embeddings(spark, raw_dir)

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        batch = batch_df.filter(F.col("vec_id").isNotNull()).dropDuplicates(["vec_id"])
        prior = warehouse.read(index_table) if warehouse.exists(index_table) else None
        if prior is not None:
            batch = batch.join(
                prior.select(F.col("id").alias("vec_id")).distinct(), "vec_id", "left_anti"
            )
        pairs, updated = similarity.incremental_embedding_pairs(
            prior, batch, threshold, bands, rows_per_band, seed, "vec_id", "embedding", dim
        )
        pairs = pairs.withColumn("batch_id", F.lit(batch_id))
        if warehouse.exists(pairs_table):
            existing = warehouse.read(pairs_table).select("id1", "id2")
            fresh = pairs.join(existing, ["id1", "id2"], "left_anti")
            warehouse.append(fresh, pairs_table)
        else:
            warehouse.overwrite(pairs, pairs_table)
        # append-only index update, same O(batch) argument as the text fold
        if prior is not None:
            fresh_keys = updated.join(batch.select(F.col("vec_id").alias("id")), "id", "semi")
            warehouse.append(fresh_keys, index_table)
        else:
            warehouse.overwrite(updated, index_table)

    return (
        vecs.writeStream.foreachBatch(_fold)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
