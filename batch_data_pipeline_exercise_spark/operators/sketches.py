"""Mergeable-sketch maintenance: incremental DISTINCT counts and
quantiles without re-reading history.

Plain partial aggregation keeps SUM/COUNT/MIN/MAX maintainable
increment-over-increment (see ``incremental_monthly_revenue``), but
COUNT(DISTINCT) and percentiles are not summable — a 100 TB pipeline
either re-scans history per report or stores a MERGEABLE summary per
increment. Apache DataSketches (built into Spark: ``hll_sketch_agg`` /
``hll_union_agg``, ``kll_sketch_*``) provides exactly that: per-batch
sketch rows union-merge at read time, at any grouping coarser than the
stored one, touching only the sketch table.

Determinism note: HLL/KLL sketches are hash-based and order-
independent, so a given input SET produces the same sketch bytes and
the same estimate on every run and partitioning — and below the
sketch's sparse-mode threshold (~2^lgK coupons) the HLL estimate is
EXACT, which is what lets ``user_reach_by_type`` carry a plain
COUNT(DISTINCT) oracle at test scales (cardinality 1.5k vs lgK=17
threshold 131k; beyond it the estimate degrades gracefully to ±~1%
and the oracle pairing would switch to rows-only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_distinct_sketches(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lg_k: int = 17,
    sketch_col: str = "hll_sketch",
) -> DataFrame:
    """One HLL sketch row per group for THIS increment — the mergeable
    replacement for storing raw values. Append the result to the sketch
    table; history is never re-read."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(lg_k)).alias(sketch_col)
    )


def merge_distinct_counts(
    sketches: DataFrame,
    group_cols: list[str],
    lg_k: int = 17,
    sketch_col: str = "hll_sketch",
    out_col: str = "n_distinct",
) -> DataFrame:
    """Roll accumulated sketch rows up to ``group_cols`` (any subset of
    the stored grouping) and estimate the distinct count. Reads ONLY the
    sketch table — cost is proportional to the number of stored groups,
    not the number of raw rows ever ingested."""
    return sketches.groupBy(*group_cols).agg(
        F.hll_sketch_estimate(
            F.hll_union_agg(F.col(sketch_col), F.lit(True))
        ).alias(out_col)
    )


def build_quantile_sketches(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 2048,
    sketch_col: str = "kll_sketch",
) -> DataFrame:
    """One KLL(double) sketch row per group per increment — mergeable
    percentiles (rank error ~1.7/sqrt(k) at k=2048 ≈ 0.08%)."""
    return df.groupBy(*group_cols).agg(
        F.kll_sketch_agg_double(F.col(value_col).cast("double"), F.lit(k)).alias(sketch_col)
    )


def merge_quantiles(
    sketches: DataFrame,
    group_cols: list[str],
    quantiles: list[float],
    sketch_col: str = "kll_sketch",
) -> DataFrame:
    """Merge stored KLL sketches to ``group_cols`` and read off the
    requested quantiles as ``q_<pct>`` columns.

    Spark ships KLL merge only as a BINARY scalar
    (``kll_sketch_merge_double``), not an aggregate, so the rollup
    collects each group's sketch rows and left-folds the merge. The
    list is bounded by the number of stored INCREMENTS per group (one
    sketch row each, ~KB apiece), never by raw data volume."""
    merged = sketches.groupBy(*group_cols).agg(
        F.collect_list(F.col(sketch_col)).alias("__l")
    ).withColumn(
        "__m",
        F.expr(
            "aggregate(slice(__l, 2, greatest(size(__l) - 1, 0)), element_at(__l, 1), "
            "(acc, x) -> kll_sketch_merge_double(acc, x))"
        ),
    )
    cols = [
        F.kll_sketch_get_quantile_double(F.col("__m"), F.lit(float(q))).alias(
            f"q_{str(q).replace('.', '_')}"
        )
        for q in quantiles
    ]
    return merged.select(*group_cols, *cols)
