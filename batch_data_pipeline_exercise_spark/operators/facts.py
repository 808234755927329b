"""Idempotent fact maintenance (M3).

The reference's fact load is "insert all candidate rows, let
``UNIQUE(order_id)`` + ``ON CONFLICT DO NOTHING`` keep the first arrival"
(reference ``process_orders_sqls.py:135-147``). Parquet has no constraints,
so idempotency is algorithmic (SURVEY.md §2.12 M3):

1. within the batch, keep the earliest candidate per key
   (``row_number() = 1`` — the reference's UNIQUE race, made deterministic);
2. against the existing fact, drop keys already present (left-anti join).

At scale: the window and the anti-join both shuffle on the fact key — the
same key the fact table is naturally bucketed/partitioned by, so with a
bucketed fact table the anti-join is shuffle-free on the existing side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def earliest_per_key(df: DataFrame, key: str, order_cols: list[str]) -> DataFrame:
    """First row per key by ``order_cols`` (reference W1,
    ``process_orders_sqls.py:93-98``)."""
    w = Window.partitionBy(key).orderBy(*order_cols)
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")


def idempotent_append_rows(
    existing: DataFrame | None,
    candidates: DataFrame,
    key: str,
    order_cols: list[str],
) -> DataFrame:
    """Rows safe to append: earliest candidate per key, minus keys already
    in ``existing``. Appending the result re-run after re-run is a no-op.

    NULL-key candidates are dropped outright: the anti-join can never
    match them (NULL != NULL), so they would re-append every run — and
    the fact key is NOT NULL by contract anyway (reference DDL
    ``process_orders_sqls.py:81``)."""
    fresh = earliest_per_key(candidates.filter(F.col(key).isNotNull()), key, order_cols)
    if existing is None:
        return fresh
    return fresh.join(existing.select(key), on=key, how="left_anti")
