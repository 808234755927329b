"""The reference's seven analytics metrics as pure DataFrame transforms.

Specs: reference ``README.md:43-49`` (five order metrics) and
``README.md:63-65`` (two inventory metrics); instructor SQL at
``docs/cheat-sheets/postgresql.md:104-146``. Each function takes the
warehouse DataFrames plus an explicit ``as_of`` timestamp replacing the
SQL's ``now()``/``CURRENT_TIMESTAMP`` (F12) so results are deterministic
and testable.

Join strategy notes (100 TB): dim_dates (29k rows) and current dim slices
are broadcast; the fact↔dim_orders point-in-time joins keep an equi key
(``order_id``) so Catalyst plans a hash join with the interval predicate
as a residual filter — never a nested-loop (SURVEY.md §4).
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from batch_data_pipeline_exercise_spark.functions.core import ts_lit, current_at
from batch_data_pipeline_exercise_spark.operators.scd2 import current_slice


def current_orders_by_status(dim_orders: DataFrame, as_of: datetime | str) -> DataFrame:
    """Metric 1 (README.md:45; SQL postgresql.md:105-108): number of orders
    currently in each status."""
    return (
        current_slice(dim_orders, as_of)
        .groupBy("status")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


def orders_created_per_quarter(fact_orders: DataFrame, dim_dates: DataFrame) -> DataFrame:
    """Metric 2 (README.md:46; SQL postgresql.md:113-120): orders created
    per year/quarter, via the yyyymmdd date-key join J1."""
    return (
        fact_orders.join(F.broadcast(dim_dates), fact_orders.created_date_id == dim_dates.id)
        .groupBy("year", "quarter")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("year", "quarter")
    )


def orders_created_per_quarter_category(
    fact_orders: DataFrame, dim_products: DataFrame, dim_dates: DataFrame
) -> DataFrame:
    """Metric 3 (README.md:47; SQL postgresql.md:125-134): orders created
    per quarter per product category — the point-in-time join J3: each
    order matches the product version valid at its creation time. Inner
    join, so dangling product ids and pre-dim creations drop (reference
    semantics)."""
    f, d = fact_orders.alias("f"), dim_products.alias("d")
    pit = current_at(F.col("f.created_time"), "d.start_time", "d.end_time")
    return (
        f.join(d, (F.col("f.product_id") == F.col("d.id")) & pit)
        .join(F.broadcast(dim_dates), F.col("f.created_date_id") == dim_dates.id)
        .groupBy("year", "quarter", "category")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("year", "quarter", "category")
    )


def retained_orders(fact_orders: DataFrame, dim_orders: DataFrame, as_of: datetime | str) -> DataFrame:
    """Metric 4 (README.md:48; SQL postgresql.md:139-146): orders created
    before the current month whose current status is not 'completed'."""
    t = ts_lit(as_of)
    cur = current_slice(dim_orders, as_of).select("order_id", "status")
    return (
        fact_orders.filter(F.col("created_time") < F.date_trunc("month", t))
        .join(cur, "order_id")
        .filter(F.col("status") != "completed")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


def monthly_created_not_completed(fact_orders: DataFrame, dim_orders: DataFrame) -> DataFrame:
    """Metric 5 (README.md:49, spec-only): per creation month, orders that
    were NOT completed by month end.

    Point-in-time join at each order's month-end cutoff — equi key
    ``order_id`` + interval residual, so it stays a hash join.
    """
    f = fact_orders.withColumn(
        "cutoff", F.add_months(F.date_trunc("month", F.col("created_time")), 1).cast("timestamp")
    ).alias("f")
    d = dim_orders.alias("d")
    pit = (F.col("f.cutoff") > F.col("d.start_time")) & (F.col("f.cutoff") <= F.col("d.end_time"))
    # status at instant just before cutoff: start < cutoff <= end
    return (
        f.join(d, (F.col("f.order_id") == F.col("d.order_id")) & pit, "left")
        .groupBy(F.date_format("f.created_time", "yyyy-MM").alias("month"))
        .agg(
            F.count(F.lit(1)).alias("orders_created"),
            F.count_if((F.col("d.status").isNull()) | (F.col("d.status") != "completed")).alias(
                "not_completed"
            ),
        )
        .orderBy("month")
    )


def daily_stock_by_category(
    inventory_daily: DataFrame, dim_products: DataFrame, date_from: str, date_to: str
) -> DataFrame:
    """Metric 6 (README.md:64): total stock per category per day.

    ``inventory_daily`` is the forward-filled dense series from
    ``plans/inventory.py``. Stock is a LEVEL (guides.md:52): summed across
    products within a day, never across days. Category is resolved
    point-in-time at END of day (next midnight) — a batch stamped during
    the day governs that day's rollup."""
    inv = inventory_daily.filter((F.col("date") >= F.lit(date_from)) & (F.col("date") <= F.lit(date_to))).alias("i")
    d = dim_products.alias("d")
    day_ts = F.date_add(F.col("i.date"), 1).cast("timestamp")
    pit = (day_ts >= F.col("d.start_time")) & (day_ts < F.col("d.end_time"))
    return (
        inv.join(d, (F.col("i.product_id") == F.col("d.id")) & pit, "left")
        .groupBy("i.date", "d.category")
        .agg(F.sum("i.amount").alias("total_stock"))
        .orderBy("date", "category")
    )


def month_end_stock_by_category(
    inventory_daily: DataFrame, dim_products: DataFrame, dim_dates: DataFrame, date_from: str, date_to: str
) -> DataFrame:
    """Metric 7 (README.md:65): stock per category at each month end —
    the daily series semi-joined to dim_dates' last_day_of_month spine
    (create_dim_dates.py:43)."""
    month_ends = dim_dates.filter(F.col("datum") == F.col("last_day_of_month")).select(
        F.col("datum").alias("date")
    )
    daily = daily_stock_by_category(inventory_daily, dim_products, date_from, date_to)
    return daily.join(F.broadcast(month_ends), "date").orderBy("date", "category")
