"""Inventory forward-fill — dense daily stock levels from changed-only
snapshots.

The inventory feed reports a product only on days its stock changed
(reference README.md:55-61), so daily metrics need gap-filling
(SURVEY.md §2.4 A7). Spark-first approach:

1. per product, generate the dense date range [first snapshot, horizon]
   with ``F.sequence`` + ``explode`` — linear in output rows, no cross
   join against a global spine;
2. left-join the sparse snapshots back on (product, date);
3. forward-fill with ``last(amount, ignorenulls=True)`` over
   ``rowsBetween(unboundedPreceding, currentRow)``.

One shuffle on product_id; window state is a single value per row.
At 100 TB the output is inherently |products| × |days| — partition the
result by date for downstream pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def forward_fill_daily(snapshots: DataFrame, horizon: str) -> DataFrame:
    """Dense (product_id, date, amount) series from changed-only snapshots.

    ``snapshots``: columns ``product_id``, ``date``, ``amount`` —
    duplicates per (product, date) resolved to the latest ``processed_time``
    if that column exists, else arbitrary-but-deterministic max amount.
    ``horizon``: last date (inclusive) to fill through.
    """
    order_col = "processed_time" if "processed_time" in snapshots.columns else "amount"
    w_dedup = Window.partitionBy("product_id", "date").orderBy(F.col(order_col).desc())
    sparse = (
        snapshots.withColumn("__rn", F.row_number().over(w_dedup))
        .filter(F.col("__rn") == 1)
        .select("product_id", "date", "amount")
    )

    # sequence(a, b) with b < a generates a DESCENDING range (verified on
    # Spark 4): a horizon before a product's first snapshot would
    # fabricate pre-history spine rows with NULL amounts. Emit no spine
    # for such products instead (explode of NULL produces no rows).
    hz = F.lit(horizon).cast("date")
    spine = (
        sparse.groupBy("product_id")
        .agg(F.min("date").alias("__first"))
        .select(
            "product_id",
            F.explode(
                F.when(hz >= F.col("__first"), F.sequence(F.col("__first"), hz))
            ).alias("date"),
        )
    )

    w_fill = (
        Window.partitionBy("product_id")
        .orderBy("date")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(sparse, ["product_id", "date"], "left")
        .withColumn("amount", F.last("amount", ignorenulls=True).over(w_fill))
        .select("product_id", "date", "amount")
    )
