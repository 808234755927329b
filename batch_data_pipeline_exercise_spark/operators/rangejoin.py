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
        matched = p.join(iv, "__bucket").filter(pred).drop("__bucket")
        iv_cols = [c for c in intervals.columns]
        # null-safe anti-join: plain column-list anti uses null-unsafe
        # equality, so a matched point row containing a NULL would ALSO
        # survive into the missing set and appear twice in the output
        m = matched.select(*points.columns).dropDuplicates().alias("m")
        pa = points.alias("p")
        anti_cond = None
        for c in points.columns:
            eq = F.col(f"p.{c}").eqNullSafe(F.col(f"m.{c}"))
            anti_cond = eq if anti_cond is None else (anti_cond & eq)
        missing = pa.join(m, anti_cond, "left_anti").select(*[F.col(f"p.{c}").alias(c) for c in points.columns])
        for c in iv_cols:
            missing = missing.withColumn(c, F.lit(None).cast(dict(intervals.dtypes)[c]))
        return matched.unionByName(missing)
    raise ValueError(f"unsupported how={how!r}")
