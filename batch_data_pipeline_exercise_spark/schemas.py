"""Declared schemas for every feed and warehouse table.

The reference declares fixed DDL for each table (reference
``examples/process_orders_sqls.py:4-89``, ``examples/create_dim_dates.py:20-31``);
here the same contracts are explicit ``StructType``s. CSV ingestion is
schema-on-read against these (no positional COPY — Spark's reader matches
the header), which removes the reference's row-at-a-time normalize step
(``examples/shared.py:3-18``) entirely.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Sentinel for "currently valid" SCD2 rows. The reference uses
# 2999-12-31 23:59:59 (process_orders_sqls.py:1), chosen over year 9999 to
# dodge a Postgres cast overflow; we keep the same value for parity.
SCD2_SENTINEL = "2999-12-31 23:59:59"

# ---------------------------------------------------------------------------
# Source feed schemas (reference README.md:18-61; FIXTURES.md §1-3)
# ---------------------------------------------------------------------------

PRODUCTS_FEED = T.StructType(
    [
        T.StructField("id", T.StringType(), nullable=False),
        T.StructField("title", T.StringType()),
        T.StructField("category", T.StringType()),
        T.StructField("price", T.DecimalType(18, 2)),
    ]
)

# Header in the raw feed: id,productId,amount,totalPrice,status,timestamp
ORDER_EVENTS_FEED = T.StructType(
    [
        T.StructField("id", T.StringType(), nullable=False),
        T.StructField("productId", T.StringType()),
        T.StructField("amount", T.DecimalType(18, 2)),
        T.StructField("totalPrice", T.DecimalType(18, 2)),
        T.StructField("status", T.StringType()),
        T.StructField("timestamp", T.TimestampType()),
    ]
)

INVENTORY_FEED = T.StructType(
    [
        T.StructField("productId", T.StringType(), nullable=False),
        T.StructField("amount", T.DecimalType(18, 2)),
        T.StructField("date", T.DateType()),
    ]
)

# ---------------------------------------------------------------------------
# Warehouse table schemas (FIXTURES.md §4)
# ---------------------------------------------------------------------------

STG_PRODUCTS = T.StructType(
    [
        T.StructField("id", T.StringType(), nullable=False),
        T.StructField("title", T.StringType()),
        T.StructField("category", T.StringType()),
        T.StructField("price", T.DecimalType(18, 2)),
        T.StructField("processed_time", T.TimestampType()),
    ]
)

STG_ORDERS = T.StructType(
    [
        T.StructField("id", T.StringType(), nullable=False),
        T.StructField("product_id", T.StringType()),
        T.StructField("amount", T.DecimalType(18, 2)),
        T.StructField("total_price", T.DecimalType(18, 2)),
        T.StructField("status", T.StringType()),
        T.StructField("event_time", T.TimestampType()),
        T.StructField("processed_time", T.TimestampType()),
    ]
)

DIM_PRODUCTS = T.StructType(
    [
        T.StructField("id", T.StringType(), nullable=False),
        T.StructField("title", T.StringType()),
        T.StructField("category", T.StringType()),
        T.StructField("price", T.DecimalType(18, 2)),
        T.StructField("processed_time", T.TimestampType()),
        T.StructField("start_time", T.TimestampType(), nullable=False),
        T.StructField("end_time", T.TimestampType(), nullable=False),
    ]
)

DIM_ORDERS = T.StructType(
    [
        T.StructField("order_id", T.StringType(), nullable=False),
        T.StructField("status", T.StringType()),
        T.StructField("event_time", T.TimestampType()),
        T.StructField("processed_time", T.TimestampType()),
        T.StructField("start_time", T.TimestampType(), nullable=False),
        T.StructField("end_time", T.TimestampType(), nullable=False),
    ]
)

FACT_ORDERS_CREATED = T.StructType(
    [
        T.StructField("order_id", T.StringType(), nullable=False),
        T.StructField("product_id", T.StringType()),
        T.StructField("created_date_id", T.StringType()),
        T.StructField("created_time", T.TimestampType()),
        T.StructField("amount", T.DecimalType(18, 2)),
        T.StructField("total_price", T.DecimalType(18, 2)),
        T.StructField("processed_time", T.TimestampType()),
    ]
)

FACT_INVENTORY = T.StructType(
    [
        T.StructField("product_id", T.StringType(), nullable=False),
        T.StructField("amount", T.DecimalType(18, 2)),
        T.StructField("snapshot_date", T.DateType(), nullable=False),
        T.StructField("processed_time", T.TimestampType()),
    ]
)

DIM_DATES = T.StructType(
    [
        T.StructField("id", T.StringType(), nullable=False),
        T.StructField("datum", T.DateType(), nullable=False),
        T.StructField("day_of_month", T.IntegerType()),
        T.StructField("day_of_year", T.IntegerType()),
        T.StructField("month", T.IntegerType()),
        T.StructField("quarter", T.IntegerType()),
        T.StructField("year", T.IntegerType()),
        T.StructField("first_day_of_month", T.DateType()),
        T.StructField("last_day_of_month", T.DateType()),
        T.StructField("first_day_of_next_month", T.DateType()),
    ]
)
