"""Skew-handling utilities: salting for hot keys.

AQE's skew-join splitting (enabled in ``session.py``) covers sort-merge
join skew at runtime, but two shapes still need explicit salting at
100 TB:

- **aggregation skew**: a groupBy where one key holds a large share of all
  rows bottlenecks its single reduce task. ``salted_agg`` splits each key
  into ``n_salts`` partial groups and re-aggregates — classic two-level
  combine; correct for any algebraic aggregate (sum/count/min/max).
- **broadcast-impossible skewed join**: joining a huge skewed fact to a
  mid-size dim that exceeds the broadcast threshold. ``salted_join``
  explodes the dim ``n_salts``× and salts the fact side with a seeded
  ``rand`` (deterministic per partition layout, so task retries stay
  stable), spreading each hot key over ``n_salts`` tasks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt(df_cols: list[str], n_salts: int) -> Column:
    """Per-row salt in [0, n_salts).

    Seeded ``rand``: deterministic per (seed, partition index, row
    position), so task retries reproduce the same salts for a stable
    input layout. A pure row-content hash would NOT work here — the hot
    key's rows are often byte-identical (the exact shape salting
    targets), and identical rows would all hash to one salt, defeating
    the spread."""
    return F.floor(F.rand(42) * n_salts).cast("int")


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-level aggregation for skewed keys.

    ``aggs``: output_name → (function, column) with function in
    {sum, count, min, max}. Example::

        salted_agg(events, ["event_type"], {"n": ("count", "*"),
                                            "total": ("sum", "value")})

    Level 1 aggregates (keys + salt) — spreading a hot key over
    ``n_salts`` tasks; level 2 merges the partials (tiny input).
    """
    mergers = {"count": "sum", "sum": "sum", "min": "min", "max": "max"}
    level1 = [
        # count('*') counts rows; count(col) must keep SQL semantics and
        # skip NULLs of that column
        (F.count(F.lit(1)) if (fn == "count" and col == "*") else getattr(F, fn)(col)).alias(f"__p_{name}")
        for name, (fn, col) in aggs.items()
    ]
    level2 = [
        getattr(F, mergers[fn])(f"__p_{name}").alias(name) for name, (fn, col) in aggs.items()
    ]
    salted = df.withColumn("__salt", _salt(df.columns, n_salts))
    return salted.groupBy(*keys, "__salt").agg(*level1).groupBy(*keys).agg(*level2)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the dim side replicated ``n_salts``× and the fact
    side salted deterministically, so a hot join key spreads over
    ``n_salts`` reduce tasks instead of one. Dim replication costs
    ``n_salts × |dim|`` — use when dim is too big to broadcast but far
    smaller than the fact.

    Only inner/left are supported: right/full would emit every unmatched
    dim row once per salt replica."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports how in ('inner', 'left'), got {how!r}")
    dim_rep = dim.withColumn("__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))))
    fact_salted = fact.withColumn("__salt", _salt(fact.columns, n_salts))
    return fact_salted.join(dim_rep, [on, "__salt"], how).drop("__salt")
