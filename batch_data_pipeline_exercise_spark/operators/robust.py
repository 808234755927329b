"""Robust statistics for data cleaning: winsorization, anomaly flags,
group imputation.

A 100 TB corpus always carries contaminated numerics — fat-tailed spam
values, sensor glitches, nulls-by-convention — and the cleaning passes
that handle them must be (a) one-shuffle window/agg plans, never global
sorts, and (b) bit-reproducible across engines so the differential
oracles can pin them. Three rules make that work here:

- **Discrete percentiles, not interpolated.** ``percentile_cont``'s
  linear interpolation is an arithmetic expression whose evaluation
  order differs between engines (last-ulp drift). The value AT rank
  ``ceil(p*n)`` is an element of the data — selected, not computed —
  so it is identical everywhere. Rank arithmetic is pure integers.
- **Anomaly tests as integer inequalities.** A trailing z-score test
  ``|x-μ| > z·σ`` over integer counts is equivalent to
  ``(k·x - m)² > z²·(k·s2 - m²)`` with m = Σx, s2 = Σx² over the k
  trailing points — every operand an exact BIGINT, so the flag can
  never flip on floating-point noise.
- **Means from decimal sums.** Imputed values are
  ``CAST(decimal_sum AS DOUBLE)/count`` — one deterministic double
  division on exact operands (the money-math rule from
  ``plans/contract.py``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def winsorize(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    tie_col: str,
    p_lo_pct: int = 5,
    p_hi_pct: int = 95,
    out_col: str = "winsorized",
) -> DataFrame:
    """Clamp ``value_col`` to its per-group discrete [p_lo, p_hi]
    percentiles (spam/outlier taming before averaging).

    The percentile is the group's value at rank ``ceil(p*n)`` under
    ``(value, tie_col)`` ordering, with ``n`` the NON-NULL value count —
    NULL values are excluded from the ranking (nulls-last) and from the
    bounds, and winsorize to NULL (clamping would fabricate a p_lo
    value that a downstream mean then averages in; impute first if
    that's wanted). Integer rank arithmetic ``(n*pct + 99) div 100``,
    so the bound is an actual data element and cross-engine exact.
    Plan: one hash shuffle on ``group_cols``, then a ranking window +
    two unordered window aggregates over the SAME partitioning (no
    second exchange), then a narrow clamp projection. Adds ``out_col``
    plus ``__p_lo``/``__p_hi`` bound columns.
    """
    wp = Window.partitionBy(*group_cols)
    wr = wp.orderBy(F.col(value_col).asc_nulls_last(), F.col(tie_col).asc())
    rn = F.row_number().over(wr)
    n = F.count(F.col(value_col)).over(wp)  # non-null count; NULLs rank after rn = n
    lo_rank = (n * p_lo_pct + 99) / F.lit(100)  # ceil(n*p/100) as int div
    hi_rank = (n * p_hi_pct + 99) / F.lit(100)
    ranked = df.withColumn("__rn", rn).withColumn(
        "__lo_rank", F.floor(lo_rank).cast("bigint")
    ).withColumn("__hi_rank", F.floor(hi_rank).cast("bigint"))
    lo = F.max(F.when(F.col("__rn") == F.col("__lo_rank"), F.col(value_col))).over(wp)
    hi = F.max(F.when(F.col("__rn") == F.col("__hi_rank"), F.col(value_col))).over(wp)
    return (
        ranked.withColumn("__p_lo", lo)
        .withColumn("__p_hi", hi)
        .withColumn(
            out_col,
            F.when(
                F.col(value_col).isNotNull(),
                F.least(F.greatest(F.col(value_col), F.col("__p_lo")), F.col("__p_hi")),
            ),
        )
        .drop("__rn", "__lo_rank", "__hi_rank")
    )


def trailing_count_anomalies(
    counts: DataFrame,
    key_cols: list[str],
    order_col: str,
    count_col: str,
    window: int = 7,
    z: int = 3,
    min_points: int = 3,
) -> DataFrame:
    """Flag per-key count points whose deviation from the trailing
    ``window`` points exceeds ``z`` sample-ish sigmas — the daily-volume
    canary every ingestion pipeline runs.

    The test is the integer inequality
    ``(k·x − m)² > z²·(k·s2 − m²)`` (m = Σ, s2 = Σx² over the k ≥
    ``min_points`` trailing rows), algebraically z² ≥ the squared
    z-score against the trailing population variance — all BIGINT, no
    float in the decision. Current row EXCLUDED from its own baseline
    (rows -window..-1), so a spike can't mask itself. One window over
    the key partitioning; input is already an aggregate (tiny vs raw).
    Adds ``trailing_n``, ``trailing_sum``, ``is_anomaly``.
    """
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(order_col)
        .rowsBetween(-window, -1)
    )
    d38 = "decimal(38,0)"
    x = F.col(count_col).cast("bigint")
    k = F.count(count_col).over(w)
    m = F.sum(x).over(w)
    # the per-point square must ALSO be decimal: x*x in bigint wraps once
    # a single count exceeds ~3e9, before the window sum ever sees it
    s2 = F.sum(x.cast(d38) * x.cast(d38)).over(w)
    # squares widen to DECIMAL(38,0): daily counts ~5e8 give k·x − m up
    # to ~3.5e9 whose bigint square wraps negative (and k·s2 earlier) —
    # the same int64 ceiling pagerank_scaled hit; decimal keeps the
    # inequality exact to ~10^19-scale counts
    dev = (k * x - m).cast(d38)
    spread = (k.cast(d38) * s2.cast(d38)) - (m.cast(d38) * m.cast(d38))
    flag = (k >= min_points) & (dev * dev > F.lit(z * z).cast(d38) * spread)
    return (
        counts.withColumn("trailing_n", k)
        .withColumn("trailing_sum", m)
        .withColumn("is_anomaly", F.coalesce(flag, F.lit(False)))
    )


def impute_by_group(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    missing: Column,
    out_col: str = "imputed",
    flag_col: str = "was_imputed",
    scale: int = 2,
    broadcast_stats: bool = False,
) -> DataFrame:
    """Replace values where ``missing`` holds with the group mean of the
    non-missing values (mean-imputation, the baseline cleaning op).

    The mean is ``CAST(SUM(decimal) AS DOUBLE)/COUNT`` over non-missing
    rows — exact accumulation, one conditional aggregate joined back.
    Groups with no clean value impute NULL (honest: nothing to learn
    from). ``broadcast_stats`` only when the group domain is provably
    small (a status/type enum) — for high-cardinality groups (users,
    documents) leave it False: the stats side shares the fact's key
    partitioning and AQE still promotes genuinely-small sides to
    broadcast at runtime.
    """
    clean = F.when(missing, F.lit(None)).otherwise(F.col(value_col))
    stats = df.groupBy(*group_cols).agg(
        (
            F.sum(clean.cast(f"decimal(18,{scale})")).cast("double")
            / F.count(clean)
        ).alias("__grp_mean")
    )
    if broadcast_stats:
        stats = F.broadcast(stats)
    return (
        df.join(stats, group_cols, "left")
        .withColumn(flag_col, missing)
        .withColumn(
            out_col,
            F.when(missing, F.col("__grp_mean")).otherwise(F.col(value_col).cast("double")),
        )
        .drop("__grp_mean")
    )
