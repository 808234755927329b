"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real — schemas, Arrow-batched ``mapInPandas``
transforms, partitioning discipline — while the codec step itself is
STUBBED with a deterministic fake (this container ships no image/audio
libraries). Swapping ``_decode_image_stub`` for a real
PIL/libvips/ffmpeg call changes nothing structurally: the UDF signature,
batch shape, and output schema stay as tested.

Scale notes: media blobs make rows wide — transforms here preserve
partitioning (no shuffle), and callers should keep blob tables
partitioned by a content-hash prefix so skewed media sizes spread evenly.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("content", T.BinaryType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("mean_luma", T.DoubleType()),
        T.StructField("phash", T.StringType()),
    ]
)


def attach_media_metadata(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Cheap metadata derivable without decoding: byte length + content
    hash (dedup key for media blobs) — JVM-side, no UDF. sha256 rather
    than sha1: same hex in every engine this repo oracles against."""
    return df.withColumn("n_bytes", F.length(F.col(content_col)).cast("int")).withColumn(
        "content_sha256", F.sha2(F.col(content_col), 256)
    )


def _decode_image_stub(content: bytes) -> tuple[int, int, float, str]:
    """Deterministic fake decoder.

    A real implementation would be ``PIL.Image.open(io.BytesIO(content))``;
    unavailable here, so derive stable pseudo-dimensions/luma/phash from
    the content digest. Raises on None to mirror codec failure behavior.
    """
    if content is None:
        raise NotImplementedError("real image decoding requires PIL/libvips (not in this container)")
    d = hashlib.sha256(content).digest()
    width = 64 + d[0] % 192
    height = 64 + d[1] % 192
    mean_luma = d[2] / 255.0
    phash = d[3:11].hex()
    return width, height, mean_luma, phash


def extract_image_features(df: DataFrame, id_col: str = "media_id", content_col: str = "content") -> DataFrame:
    """Arrow-batched feature extraction over ``mapInPandas`` — the
    canonical shape for codec work: per-batch Python cost amortized over
    thousands of rows, schema declared up front, partitioning preserved."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, content in zip(pdf[id_col], pdf[content_col]):
                w, h, luma, ph = _decode_image_stub(bytes(content))
                rows.append((mid, w, h, len(content), luma, ph))
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "n_bytes", "mean_luma", "phash"]
            )

    return df.select(id_col, content_col).mapInPandas(batches, schema=IMAGE_FEATURES_SCHEMA)


def resize_images(df: DataFrame, max_side: int, content_col: str = "content") -> DataFrame:
    """Resize stub: passes content through and records intended target
    dims (real impl would re-encode). Keeps the contract visible/testable."""
    feats = extract_image_features(df)
    scale = F.least(F.lit(1.0), F.lit(max_side) / F.greatest("width", "height"))
    return feats.select(
        "media_id",
        F.round(F.col("width") * scale).cast("int").alias("target_width"),
        F.round(F.col("height") * scale).cast("int").alias("target_height"),
    )


def sample_video_frames(df: DataFrame, every_ms: int, id_col: str = "media_id") -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled timestamp,
    generated JVM-side with sequence/explode; frame decode itself is the
    stubbed step. Input needs ``duration_ms``."""
    return df.select(
        id_col,
        F.explode(F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))).alias("frame_ts_ms"),
    )
