"""Interval algebra: coalescing overlapping validity/activity spans.

The gaps-and-islands shape: given per-key intervals ``[start, end]``,
merge every overlapping-or-touching run into one span. This is the
batch core under session reconstruction, SCD2 interval repair, and
on-call / availability rollups — and the scalable plan is one hash
shuffle on the key plus two ordered windows, never a self-join
(the naive ``a.start <= b.end AND b.start <= a.end`` join is quadratic
per key).

Island detection is the running-max trick: scanning a key's intervals
by ``(start, tie)``, an interval starts a NEW island iff its start lies
strictly after the max end seen so far; the island id is the running
sum of those break flags. All comparisons are on the native
timestamp/numeric type — no float arithmetic — so results are exact in
any engine and the SQL oracle states the identical windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def coalesce_intervals(
    df: DataFrame,
    key_cols: list[str],
    start_col: str,
    end_col: str,
    tie_col: str,
) -> DataFrame:
    """Merge each key's overlapping-or-touching intervals into maximal
    spans.

    Returns one row per merged span: ``key_cols``, ``span_start``,
    ``span_end``, ``n_intervals`` (how many inputs merged into it).
    Touching intervals (next.start == prev.end) merge — use a strictly
    positive pad upstream if point-contact should split.

    Plan: shuffle once on ``key_cols``; window 1 computes the running
    max end over preceding rows (island break flag), window 2 the
    running sum of flags (island id) over the SAME sort — Spark plans
    one exchange + one sort for both; the final groupBy re-uses the
    key partitioning with island appended.
    """
    order = [F.col(start_col).asc(), F.col(end_col).asc(), F.col(tie_col).asc()]
    wprev = (
        Window.partitionBy(*key_cols)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wrun = (
        Window.partitionBy(*key_cols)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    prev_max_end = F.max(F.col(end_col)).over(wprev)
    # two steps: a window expression can't nest inside another window's
    # argument — but both share one partitioning+sort, so still one
    # exchange + one sort in the physical plan
    flagged = df.withColumn(
        "__brk",
        F.when(prev_max_end.isNull() | (F.col(start_col) > prev_max_end), F.lit(1)).otherwise(
            F.lit(0)
        ),
    )
    with_island = flagged.withColumn("__island", F.sum("__brk").over(wrun)).drop("__brk")
    return with_island.groupBy(*key_cols, "__island").agg(
        F.min(start_col).alias("span_start"),
        F.max(end_col).alias("span_end"),
        F.count(F.lit(1)).alias("n_intervals"),
    ).drop("__island")
