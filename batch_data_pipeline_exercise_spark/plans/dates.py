"""dim_dates — the static calendar spine.

Reference: ``examples/create_dim_dates.py:20-51`` builds 29,220 rows
(1970-01-01 + 0..29219 days) with GENERATE_SERIES + EXTRACT/TO_CHAR/
DATE_TRUNC/INTERVAL arithmetic, id = yyyymmdd.

Spark-first: ``spark.range`` (a parallel, shuffle-free row generator) +
built-in date functions (SURVEY.md §2.8 F1-F7). ``F.last_day`` replaces the
``INTERVAL '1 MONTH - 1 day'`` trick, ``F.trunc`` the first-of-month
arithmetic. 29k rows is broadcast-size by construction — every join against
this dim should be (and is, via explicit hints at call sites) a
broadcast-hash join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EPOCH = "1970-01-01"
N_DAYS = 29220  # 80 years, matching create_dim_dates.py:45-46


def build_dim_dates(spark: SparkSession, n_days: int = N_DAYS, start: str = EPOCH) -> DataFrame:
    """All ten columns of the reference's dim_dates, as one narrow projection
    over a range — no shuffle, no data read."""
    datum = F.date_add(F.to_date(F.lit(start)), F.col("id").cast("int"))
    return (
        spark.range(0, n_days)
        .select(datum.alias("datum"))
        .select(
            F.date_format("datum", "yyyyMMdd").alias("id"),
            "datum",
            F.dayofmonth("datum").alias("day_of_month"),
            F.dayofyear("datum").alias("day_of_year"),
            F.month("datum").alias("month"),
            F.quarter("datum").alias("quarter"),
            F.year("datum").alias("year"),
            F.trunc("datum", "month").alias("first_day_of_month"),
            F.last_day("datum").alias("last_day_of_month"),
            F.add_months(F.trunc("datum", "month"), 1).alias("first_day_of_next_month"),
        )
    )
