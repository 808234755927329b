"""Data-quality constraint validation (dbt-tests / Deequ-style).

A warehouse pipeline gates each load on declarative expectations:
not-null, unique, accepted values, numeric ranges, referential
integrity. This operator evaluates a check suite and returns one row per
check — ``(check, column, n_violations, passed)`` — so the caller can
fail the batch, quarantine rows, or publish the report.

Scale shape: every row-level check compiles to a conditional COUNT in
ONE aggregate pass over the table (no per-check scan); ``unique`` adds
its count-distinct to the same pass. Referential-integrity checks are
each one left-anti join against the parent's key column (pruned to the
key before the shuffle; broadcast when the parent is a dim). Nothing
collects to the driver.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    """One declarative expectation. ``kind`` ∈ {not_null, unique,
    accepted_values, in_range, expression}."""

    kind: str
    column: str
    values: tuple = ()  # accepted_values
    lo: float | None = None  # in_range
    hi: float | None = None
    expr: Column | None = None  # expression: predicate that must hold


def not_null(column: str) -> Check:
    return Check("not_null", column)


def unique(column: str) -> Check:
    return Check("unique", column)


def accepted_values(column: str, values: list) -> Check:
    return Check("accepted_values", column, values=tuple(values))


def in_range(column: str, lo: float, hi: float) -> Check:
    return Check("in_range", column, lo=lo, hi=hi)


def expression(column: str, predicate: Column) -> Check:
    """Violations = rows where ``predicate`` is false or NULL."""
    return Check("expression", column, expr=predicate)


def _violation_count(c: Check) -> Column:
    col = F.col(c.column)
    if c.kind == "not_null":
        return F.count_if(col.isNull())
    if c.kind == "accepted_values":
        # NULL is not a value violation — pair with not_null to forbid it
        return F.count_if(~col.isin(*c.values) & col.isNotNull())
    if c.kind == "in_range":
        return F.count_if((col < F.lit(c.lo)) | (col > F.lit(c.hi)))
    if c.kind == "expression":
        return F.count_if(~F.coalesce(c.expr, F.lit(False)))
    raise ValueError(f"unknown check kind {c.kind!r}")


def validate(df: DataFrame, checks: list[Check]) -> DataFrame:
    """Evaluate row-level checks in ONE aggregate pass.

    Output: (check, column, n_violations, passed), one row per check.
    ``unique`` counts duplicate rows as ``count - count_distinct``
    (NULLs excluded from both, matching SQL UNIQUE semantics).
    """
    aggs: list[Column] = []
    for i, c in enumerate(checks):
        if c.kind == "unique":
            aggs.append(
                (F.count(F.col(c.column)) - F.count_distinct(F.col(c.column))).alias(f"__v{i}")
            )
        else:
            aggs.append(_violation_count(c).alias(f"__v{i}"))
    one = df.agg(*aggs)
    reports = [
        F.struct(
            F.lit(c.kind).alias("check"),
            F.lit(c.column).alias("column"),
            F.col(f"__v{i}").cast("bigint").alias("n_violations"),
            (F.col(f"__v{i}") == 0).alias("passed"),
        )
        for i, c in enumerate(checks)
    ]
    return one.select(F.explode(F.array(*reports)).alias("r")).select(
        "r.check", "r.column", "r.n_violations", "r.passed"
    )


def referential_check(
    child: DataFrame, fk: str, parent: DataFrame, pk: str, broadcast_parent: bool = True
) -> DataFrame:
    """Orphaned-foreign-key check: child rows whose non-NULL ``fk`` has
    no matching ``parent.pk``. One anti join; the parent side is pruned
    to its key (and broadcast when it is dim-sized). Same report schema
    as ``validate``."""
    keys = parent.select(F.col(pk).alias("__pk")).distinct()
    if broadcast_parent:
        keys = F.broadcast(keys)
    orphans = (
        child.filter(F.col(fk).isNotNull())
        .join(keys, F.col(fk) == F.col("__pk"), "left_anti")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return orphans.select(
        F.lit("referential").alias("check"),
        F.lit(fk).alias("column"),
        F.col("n").cast("bigint").alias("n_violations"),
        (F.col("n") == 0).alias("passed"),
    )


def observe_load_metrics(
    df: DataFrame, metrics: dict[str, Column], name: str = "load_metrics"
):
    """Attach IN-FLIGHT metrics to a DataFrame via Spark's Observation
    API: the metric aggregates are computed by the SAME job that
    materializes ``df`` (accumulator-style, merged per task), so a
    write-plus-audit costs ONE scan instead of the write plus a second
    metrics pass — at 100 TB that second pass is the entire input read
    again.

    Returns ``(observed_df, observation)``; run any action on
    ``observed_df``, then read ``observation.get`` for the metric dict.
    Use aggregates only (count/sum/min/max/avg — the merge is
    order-insensitive for these, so values are deterministic); the
    check-suite semantics of ``validate`` can ride along by passing its
    conditional counts, e.g. ``{"null_keys": F.sum(F.when(
    F.col("k").isNull(), 1).otherwise(0))}``.

    Complement, not replacement: ``validate`` produces a per-check
    result TABLE a gate can act on row-by-row; this produces driver-side
    numbers with zero extra cost, the right shape for emit-metrics-on-
    every-load telemetry.
    """
    from pyspark.sql import Observation

    obs = Observation(name)
    observed = df.observe(obs, *[c.alias(n) for n, c in metrics.items()])
    return observed, obs
