"""Bucketized range join — equi-join scale path for interval predicates.

A plain ``points ⋈ intervals ON p >= lo AND p < hi`` has no equi key, so
Catalyst plans BroadcastNestedLoopJoin (or a full cartesian at worst) —
O(|points|·|intervals|), unusable at scale unless one side is tiny.

The standard fix: quantize the range key. Points map to bucket
``floor(p / w)``; each interval explodes to every bucket it overlaps;
the join becomes equi on the bucket with the original predicate as a
residual filter. Cost: one hash shuffle on the bucket + interval
replication of ``(hi-lo)/w`` rows — pick ``w`` near the typical interval
width so replication stays O(1) per interval.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: float,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to interval rows with
    ``start <= point < end`` (half-open), via bucket-equi join.

    Column names must not collide across the two inputs (rename first).
    ``how`` supports inner / left (left keeps pointless points with NULL
    interval columns).
    """
    w = float(bucket_width)
    p = points.withColumn("__bucket", F.floor(F.col(point_col) / w))
    iv = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / w),
                # end is exclusive: a zero-width interval still lands in one bucket
                F.floor((F.col(end_col) - F.lit(1e-9)) / w),
            )
        ),
    )
    pred = (F.col(point_col) >= F.col(start_col)) & (F.col(point_col) < F.col(end_col))
    if how == "inner":
        return p.join(iv, "__bucket").filter(pred).drop("__bucket")
    if how == "left":
        # one left join with equi bucket + residual predicate: a matching
        # (point, interval) pair coincides in exactly one bucket replica
        # (the point's own), so no duplicates; unmatched points get a
        # single NULL-padded row. Catalyst still extracts the equi key.
        pa, ia = p.alias("p"), iv.alias("i")
        cond = (F.col("p.__bucket") == F.col("i.__bucket")) & pred
        return pa.join(ia, cond, "left").select(
            *[F.col(f"p.{c}").alias(c) for c in points.columns],
            *[F.col(f"i.{c}").alias(c) for c in intervals.columns],
        )
    raise ValueError(f"unsupported how={how!r}")
