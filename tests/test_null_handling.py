"""Regression tests for NULL-key handling (code-review findings): NULL
keys must neither inject garbage rows nor break idempotency."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from batch_data_pipeline_exercise_spark.operators.facts import idempotent_append_rows
from batch_data_pipeline_exercise_spark.operators.rangejoin import range_join
from batch_data_pipeline_exercise_spark.operators.scd2 import scd2_snapshot_merge


def test_snapshot_merge_null_key_no_garbage_row(spark):
    day1 = spark.createDataFrame([("a", "t1", 1.0), ("b", "t2", 2.0)], "id string, title string, price double")
    dim1 = scd2_snapshot_merge(None, day1, key="id", attr_cols=["title", "price"], ts="2021-01-01 00:00:00")
    day2 = spark.createDataFrame(
        [("a", "t1", 1.0), (None, "corrupt", 9.0)], "id string, title string, price double"
    )
    dim2 = scd2_snapshot_merge(dim1, day2, key="id", attr_cols=["title", "price"], ts="2021-01-02 00:00:00")
    rows = dim2.collect()
    # no all-NULL row injected; the NULL-key snapshot row lands as its own
    # (degenerate) open row at most — never a fully-NULL dim record
    assert not any(r["id"] is None and r["title"] is None and r["price"] is None for r in rows)
    assert {r["id"] for r in rows if r["id"] is not None} == {"a", "b"}


def test_idempotent_append_drops_null_keys(spark):
    cands = spark.createDataFrame(
        [(None, dt.datetime(2021, 1, 1)), ("o1", dt.datetime(2021, 1, 1))], "id string, t timestamp"
    )
    first = idempotent_append_rows(None, cands, "id", ["t"])
    assert first.count() == 1  # NULL key rejected
    again = idempotent_append_rows(first, cands, "id", ["t"])
    assert again.count() == 0  # and nothing re-appends


def test_range_join_left_null_column_no_duplicates(spark):
    points = spark.createDataFrame([(1, None, 25000.0), (2, "x", 999999.0)], "pid int, tag string, v double")
    intervals = spark.createDataFrame([(10, 0.0, 50000.0)], "iid int, lo double, hi double")
    out = range_join(points, intervals, "v", "lo", "hi", bucket_width=50000, how="left").collect()
    assert len(out) == 2  # the NULL-tag matched row appears ONCE, not twice
    by_pid = {r["pid"]: r for r in out}
    assert by_pid[1]["iid"] == 10 and by_pid[2]["iid"] is None


def test_kmv_overlap_null_user_ids_match_oracle(spark, tmp_path):
    """NULL user_ids hash to NULL, which sorts FIRST in Spark windows but
    LAST in DuckDB ORDER BY — without the boundary filter a NULL occupies
    a k-min slot in one engine only and the sketches diverge. Regression
    for the round-5 advice finding (latent: testdata has no NULL ids)."""
    import duckdb

    from batch_data_pipeline_exercise_spark.plans import contract
    from batch_data_pipeline_exercise_spark.plans import contract5  # noqa: F401

    rows = [("click", None), ("click", "u1"), ("view", None), ("view", "u1"), ("view", "u2")]
    # enough real users that the NULL would displace one if unfiltered
    rows += [("click", f"u{i}") for i in range(2, 80)] + [("view", f"u{i}") for i in range(2, 70)]
    spark.createDataFrame(rows, "event_type string, user_id string").coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "events.parquet"))

    q = contract.REGISTRY["event_type_user_overlap_kmv"]
    sdf = q.fn(spark, str(tmp_path))
    srows = sorted([tuple(map(repr, r)) for r in sdf.collect()])

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{tmp_path}/events.parquet/*.parquet'")
    drows = sorted([tuple(map(repr, r)) for r in con.execute(q.oracle).fetchall()])
    con.close()
    assert srows == drows
    assert all(r["k_used"] == 64 for r in sdf.collect())
