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
  explodes the dim ``n_salts``× and salts the fact side — by a unique
  key column's hash when one exists (retry-safe), else seeded ``rand``
  — spreading each hot key over ``n_salts`` tasks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt(n_salts: int, salt_col: str | None = None) -> Column:
    """Per-row salt in [0, n_salts).

    With ``salt_col`` (a unique row-level column, e.g. the fact's primary
    key): a pure content hash — fully deterministic, so a stage retry
    after shuffle-fetch failure reassigns identical salts (the
    SPARK-23207 class of nondeterministic-repartition bugs cannot lose or
    duplicate rows). Prefer this whenever a unique column exists; unique
    values spread evenly by construction.

    Without one: seeded ``rand`` — deterministic only per (seed,
    partition index, row position), i.e. stable for a stable input
    layout but NOT across a replayed partition with reordered rows. A
    row-content hash is no fallback here: the hot key's rows are often
    byte-identical (the exact shape salting targets) and would all hash
    to one salt, defeating the spread."""
    if salt_col is not None:
        return F.pmod(F.xxhash64(F.col(salt_col)), F.lit(n_salts)).cast("int")
    return F.floor(F.rand(42) * n_salts).cast("int")


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
    salt_col: str | None = None,
) -> DataFrame:
    """Two-level aggregation for skewed keys.

    ``aggs``: output_name → (function, column) with function in
    {sum, count, min, max}. Example::

        salted_agg(events, ["event_type"], {"n": ("count", "*"),
                                            "total": ("sum", "value")},
                   salt_col="event_id")

    Level 1 aggregates (keys + salt) — spreading a hot key over
    ``n_salts`` tasks; level 2 merges the partials (tiny input). Pass a
    unique ``salt_col`` for a retry-safe deterministic salt (see
    ``_salt``).
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
    salted = df.withColumn("__salt", _salt(n_salts, salt_col))
    return salted.groupBy(*keys, "__salt").agg(*level1).groupBy(*keys).agg(*level2)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
    salt_col: str | None = None,
) -> DataFrame:
    """Equi-join with the dim side replicated ``n_salts``× and the fact
    side salted, so a hot join key spreads over ``n_salts`` reduce tasks
    instead of one. Dim replication costs ``n_salts × |dim|`` — use when
    dim is too big to broadcast but far smaller than the fact. Pass a
    unique fact column as ``salt_col`` for a retry-safe deterministic
    salt (see ``_salt``).

    Only inner/left are supported: right/full would emit every unmatched
    dim row once per salt replica."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports how in ('inner', 'left'), got {how!r}")
    dim_rep = dim.withColumn("__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))))
    fact_salted = fact.withColumn("__salt", _salt(n_salts, salt_col))
    return fact_salted.join(dim_rep, [on, "__salt"], how).drop("__salt")
