"""End-to-end pipeline run on golden fixtures + all seven reference metrics,
with hand-computed expected values, plus idempotent re-run checks."""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from batch_data_pipeline_exercise_spark.plans import metrics
from batch_data_pipeline_exercise_spark.plans.inventory import forward_fill_daily
from batch_data_pipeline_exercise_spark.plans.pipeline import Pipeline

FIX = "tests/fixtures"
AS_OF = "2021-03-02 12:00:00"


@pytest.fixture(scope="module")
def wh(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("warehouse"))
    p = Pipeline(spark, root)
    p.init_dates()
    p.run_products(f"{FIX}/products_2021-03-01.csv", ts="2021-03-01 01:00:00")
    p.run_inventory(f"{FIX}/inventory_2021-03-01.csv", ts="2021-03-01 01:00:00")
    p.run_products(f"{FIX}/products_2021-03-02.csv", ts="2021-03-02 01:00:00")
    p.run_orders(f"{FIX}/orders_2021-03-02.csv", ts="2021-03-02 01:00:00")
    p.run_inventory(f"{FIX}/inventory_2021-03-03.csv", ts="2021-03-03 01:00:00")
    return p


def test_metric1_current_status(wh):
    out = {r["status"]: r["order_count"] for r in metrics.current_orders_by_status(wh.wh.read("dim_orders"), AS_OF).collect()}
    assert out == {"completed": 2, "created": 2, "deleted": 1}


def test_metric2_orders_per_quarter(wh):
    out = {(r["year"], r["quarter"]): r["order_count"] for r in metrics.orders_created_per_quarter(wh.wh.read("fact_orders_created"), wh.wh.read("dim_dates")).collect()}
    assert out == {(2019, 4): 1, (2021, 1): 4}


def test_metric3_per_quarter_category(wh):
    out = {
        (r["year"], r["quarter"], r["category"]): r["order_count"]
        for r in metrics.orders_created_per_quarter_category(
            wh.wh.read("fact_orders_created"), wh.wh.read("dim_products"), wh.wh.read("dim_dates")
        ).collect()
    }
    # o3 (dangling p9) and o5 (created before dim history) drop — reference
    # inner-join semantics; o1 matches the *pre-change* category 'tools'.
    assert out == {(2021, 1, "tools"): 1, (2021, 1, "gadgets"): 1, (2021, 1, "accessories"): 1}


def test_metric4_retained(wh):
    out = metrics.retained_orders(wh.wh.read("fact_orders_created"), wh.wh.read("dim_orders"), AS_OF).collect()
    assert out[0]["order_count"] == 1  # o5 (o3 completed)


def test_metric5_monthly_not_completed(wh):
    out = {r["month"]: (r["orders_created"], r["not_completed"]) for r in metrics.monthly_created_not_completed(wh.wh.read("fact_orders_created"), wh.wh.read("dim_orders")).collect()}
    assert out == {"2019-12": (1, 1), "2021-02": (1, 0), "2021-03": (3, 2)}


def test_metric6_daily_stock(wh):
    daily = forward_fill_daily(
        wh.wh.read("fact_inventory").select("product_id", F.col("snapshot_date").alias("date"), "amount"),
        horizon="2021-03-04",
    )
    out = {
        (str(r["date"]), r["category"]): r["total_stock"]
        for r in metrics.daily_stock_by_category(daily, wh.wh.read("dim_products"), "2021-03-01", "2021-03-04").collect()
    }
    # day 1: p1 still 'tools'; day 2 onward: 'hardware' (SCD2 point-in-time)
    assert out[("2021-03-01", "tools")] == Decimal("10.00")
    assert out[("2021-03-02", "hardware")] == Decimal("10.00")
    assert out[("2021-03-03", "hardware")] == Decimal("8.00")  # snapshot change
    assert out[("2021-03-04", "hardware")] == Decimal("8.00")  # forward-filled
    assert out[("2021-03-01", "accessories")] == Decimal("0.00")  # zero stock is a row
    assert out[("2021-03-03", "surprise")] == Decimal("5.00")  # p4 appears
    assert ("2021-03-01", "surprise") not in out  # not before first snapshot


def test_metric7_month_end_stock(wh):
    daily = forward_fill_daily(
        wh.wh.read("fact_inventory").select("product_id", F.col("snapshot_date").alias("date"), "amount"),
        horizon="2021-03-31",
    )
    out = {
        (str(r["date"]), r["category"]): r["total_stock"]
        for r in metrics.month_end_stock_by_category(
            daily, wh.wh.read("dim_products"), wh.wh.read("dim_dates"), "2021-03-01", "2021-03-31"
        ).collect()
    }
    assert out[("2021-03-31", "hardware")] == Decimal("8.00")
    assert all(d == "2021-03-31" for d, _ in out)  # only month ends survive


def test_rerun_is_noop(wh):
    dim_before = sorted(map(tuple, wh.wh.read("dim_products").collect()), key=repr)
    fact_before = sorted(map(tuple, wh.wh.read("fact_orders_created").collect()), key=repr)
    inv_before = sorted(map(tuple, wh.wh.read("fact_inventory").collect()), key=repr)

    wh.run_products(f"{FIX}/products_2021-03-02.csv", ts="2021-03-02 01:00:00")
    wh.run_orders(f"{FIX}/orders_2021-03-02.csv", ts="2021-03-02 01:00:00")
    wh.run_inventory(f"{FIX}/inventory_2021-03-03.csv", ts="2021-03-03 01:00:00")

    assert sorted(map(tuple, wh.wh.read("dim_products").collect()), key=repr) == dim_before
    assert sorted(map(tuple, wh.wh.read("fact_orders_created").collect()), key=repr) == fact_before
    assert sorted(map(tuple, wh.wh.read("fact_inventory").collect()), key=repr) == inv_before


def test_catalog_registration(wh, spark):
    wh.wh.register_catalog("dim_dates", "dim_dates_cat")
    n = spark.sql("SELECT COUNT(*) AS n FROM dim_dates_cat").first()["n"]
    assert n == 29220
    wh.wh.register_catalog("dim_dates", "dim_dates_cat")  # IF NOT EXISTS → no-op
    spark.sql("DROP TABLE dim_dates_cat")


def test_fact_partition_pruning(wh):
    """Facts are date-partitioned; a date filter must prune at the scan
    (PartitionFilters in the plan, not a post-scan filter), and the
    partition column must survive as a real DateType (not a type-inferred
    int from a yyyymmdd string)."""
    import pyspark.sql.types as T

    fact_all = wh.wh.read("fact_orders_created")
    assert isinstance(fact_all.schema["created_date"].dataType, T.DateType)
    assert isinstance(fact_all.schema["created_date_id"].dataType, T.StringType)
    fact = fact_all.filter(F.col("created_date") == "2021-03-01")
    plan = fact._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(created_date" in plan, plan
    assert fact.count() == 2  # o1, o2 created on 2021-03-01


def test_maintain_compacts_and_preserves_results(wh):
    before = {t: wh.wh.read(t).count() for t in Pipeline.MAINTAINED_TABLES if wh.wh.exists(t)}
    # per-partition gate: budget scales with partition count, so a healthy
    # compacted table never re-qualifies just because history grew
    n_parts = wh.wh.partition_dir_count("fact_inventory")
    assert n_parts >= 2  # two snapshot dates ingested by the fixture
    # threshold 0 forces compaction of every maintained table
    compacted = wh.maintain(max_files_per_partition=0)
    assert "fact_inventory" in compacted and "fact_orders_created" in compacted
    after = {t: wh.wh.read(t).count() for t in before}
    assert after == before  # maintenance never changes data
    # partition layout survives (pruning still possible)
    assert wh.wh.partition_columns("fact_inventory") == ["snapshot_date"]
    # ANALYZE ran only for compacted tables, and the catalog's partition
    # discovery means the registered name sees ALL rows (a plain
    # LOCATION registration of a partitioned dir would read 0)
    assert wh.spark.sql("SELECT COUNT(*) FROM fact_inventory").first()[0] == before["fact_inventory"]
    # generous budget: nothing qualifies, call is a cheap no-op
    assert wh.maintain(max_files_per_partition=10_000) == []


def test_catalog_partitioned_registration_sees_all_rows(wh, spark):
    wh.wh.register_catalog("fact_orders_created", "foc_cat")
    assert spark.sql("SELECT COUNT(*) FROM foc_cat").first()[0] == wh.wh.read("fact_orders_created").count()


def test_forward_fill_horizon_before_first_snapshot_is_empty(spark):
    """A horizon earlier than a product's first snapshot must produce no
    spine rows (sequence(a, b) with b < a would otherwise generate a
    DESCENDING pre-history range with NULL amounts)."""
    from batch_data_pipeline_exercise_spark.plans.inventory import forward_fill_daily

    snaps = spark.createDataFrame(
        [("p1", "2021-03-01", 5)], "product_id string, date string, amount int"
    ).withColumn("date", F.col("date").cast("date"))
    out = forward_fill_daily(snaps, horizon="2021-02-20")
    assert out.count() == 0


def test_run_products_duplicate_ids_collapse_deterministically(spark, tmp_path):
    """A duplicate id in one snapshot drop must yield ONE open SCD2 row,
    not overlapping validity intervals."""
    import csv as _csv

    from batch_data_pipeline_exercise_spark.plans.pipeline import Pipeline

    p = Pipeline(spark, str(tmp_path / "wh"))
    path = tmp_path / "products.csv"
    with open(path, "w", newline="") as f:
        w = _csv.writer(f)
        w.writerow(["id", "title", "category", "price"])
        w.writerow(["p1", "A", "C", "1.00"])
        w.writerow(["p1", "B", "C", "2.00"])
    p.run_products(str(path), ts="2021-03-01 00:00:00")
    dim = p.wh.read("dim_products")
    open_rows = dim.filter(F.col("end_time") > F.lit("2900-01-01").cast("timestamp")).collect()
    assert len(open_rows) == 1
    # greatest attribute struct wins: title B, price 2.00
    assert open_rows[0]["title"] == "B"


def test_dead_letter_rejects_are_replay_guarded(spark, tmp_path):
    """An out-of-calendar order event lands in _fact_dates_rejects exactly
    once, no matter how many times the same feed day is re-run — the
    dead-letter table follows the same append-once discipline as the
    fact it diverges from."""
    csv = tmp_path / "orders_1969.csv"
    csv.write_text(
        "id,productId,amount,totalPrice,status,timestamp\n"
        "ox,p1,1,9.99,created,1969-06-01 08:00:00\n"  # pre-dim_dates calendar
        "oy,p1,1,9.99,created,2021-03-01 08:00:00\n"
    )
    p = Pipeline(spark, str(tmp_path / "wh"))
    p.init_dates()
    p.run_orders(str(csv), ts="2021-03-01 09:00:00")
    assert p.wh.read("_fact_dates_rejects").count() == 1
    p.run_orders(str(csv), ts="2021-03-01 09:00:00")  # replay
    rej = p.wh.read("_fact_dates_rejects")
    assert rej.count() == 1
    assert [r["id"] for r in rej.collect()] == ["ox"]
    # the in-calendar row reached the fact exactly once, too
    assert p.wh.read("fact_orders_created").count() == 1
