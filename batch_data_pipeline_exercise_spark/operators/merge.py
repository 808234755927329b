"""MERGE INTO emulation on plain Parquet.

The reference's UPDATE-then-INSERT upserts (``process_orders_sqls.py:29-50``)
are the classic MERGE shape; lakehouse formats (Delta/Iceberg) expose it
as ``MERGE INTO``, which plain Parquet lacks. This operator provides the
same semantics as a deterministic rebuild — the pattern this engine uses
for SCD2, generalized:

- WHEN MATCHED [AND condition] THEN UPDATE SET (expressions over
  target ``t`` and source ``s``)
- WHEN NOT MATCHED THEN INSERT (source row)
- optionally WHEN MATCHED AND delete_condition THEN DELETE

One full-outer join on the key; output is the complete new table, to be
written with ``Warehouse.overwrite`` (atomic swap). At 100 TB this is a
single co-partitioned join — with both sides bucketed by the key it is
shuffle-free; a real lakehouse MERGE does file-level pruning on top, which
is the one capability a format upgrade would add.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def merge_into(
    target: DataFrame,
    source: DataFrame,
    key: str,
    update_set: dict[str, Column] | None = None,
    update_condition: Column | None = None,
    insert_not_matched: bool = True,
    delete_condition: Column | None = None,
    assert_unique_source_key: bool = False,
) -> DataFrame:
    """Emulated MERGE: returns the post-merge table.

    ``update_set`` maps target column name → expression (reference columns
    as ``F.col("t.x")`` / ``F.col("s.y")``). Unlisted columns keep their
    target values. ``update_condition``/``delete_condition`` are evaluated
    on matched rows only.

    A source with several rows per key fans the matched target row out
    once per match (full-outer join semantics); real ``MERGE INTO``
    raises instead. Pass ``assert_unique_source_key=True`` to get the
    lakehouse behavior — it costs one eager aggregation over the source,
    so it is opt-in; alternatively ``dropDuplicates`` the source on the
    key before calling.
    """
    if assert_unique_source_key:
        # NULL keys are exempt: they never match a target row, so several
        # NULL-key source rows are unambiguous (each just inserts) — real
        # MERGE only errors when multiple source rows hit the SAME target
        dups = (
            source.filter(F.col(key).isNotNull())
            .groupBy(key).agg(F.count(F.lit(1)).alias("n")).filter(F.col("n") > 1).limit(5).collect()
        )
        if dups:
            sample = [r[key] for r in dups]
            raise ValueError(
                f"merge_into: source has multiple rows per key {key!r} (e.g. {sample}); "
                "dedup the source or drop assert_unique_source_key"
            )
    cols = target.columns
    # explicit presence markers, NOT key-nullity: a NULL-key row on either
    # side must be retained/inserted like any unmatched row, not silently
    # classified out of existence
    t = target.withColumn("__tp", F.lit(True)).alias("t")
    s = source.withColumn("__sp", F.lit(True)).alias("s")
    j = t.join(s, F.col(f"t.{key}") == F.col(f"s.{key}"), "full_outer")

    matched = F.col("t.__tp").isNotNull() & F.col("s.__sp").isNotNull()
    t_only = F.col("t.__tp").isNotNull() & F.col("s.__sp").isNull()
    s_only = F.col("t.__tp").isNull() & F.col("s.__sp").isNotNull()

    upd = update_condition if update_condition is not None else F.lit(True)

    out_cols = []
    for c in cols:
        keep = F.col(f"t.{c}")
        expr = keep
        if update_set and c in update_set:
            expr = F.when(matched & upd, update_set[c]).otherwise(keep)
        if insert_not_matched:
            src = F.col(f"s.{c}") if c in source.columns else F.lit(None).cast(dict(target.dtypes)[c])
            expr = F.when(s_only, src).otherwise(expr)
        out_cols.append(expr.alias(c))

    # NULL-evaluating conditions mean "not deleted" (MERGE semantics), so
    # coalesce to FALSE — `keep & ~NULL` would otherwise drop the row
    delete = (
        matched & F.coalesce(delete_condition, F.lit(False)) if delete_condition is not None else F.lit(False)
    )
    out = j.select(
        *out_cols,
        matched.alias("__m"),
        t_only.alias("__t"),
        s_only.alias("__s"),
        delete.alias("__del"),
    )
    keep = F.col("__t") | F.col("__m")
    if insert_not_matched:
        keep = keep | F.col("__s")
    return out.filter(keep & ~F.col("__del")).drop("__m", "__t", "__s", "__del")
