"""Bucketized range-join unit tests (inner + left, edge alignments)."""

from __future__ import annotations

from batch_data_pipeline_exercise_spark.operators.rangejoin import range_join


def _fixtures(spark):
    points = spark.createDataFrame(
        [(1, 0.0), (2, 49999.99), (3, 50000.0), (4, 125000.0), (5, 999999.0)],
        "pid int, v double",
    )
    intervals = spark.createDataFrame(
        [(10, 0.0, 50000.0), (11, 50000.0, 100000.0), (12, 100000.0, 200000.0)],
        "iid int, lo double, hi double",
    )
    return points, intervals


def test_range_join_inner_half_open(spark):
    points, intervals = _fixtures(spark)
    out = {r["pid"]: r["iid"] for r in range_join(points, intervals, "v", "lo", "hi", bucket_width=50000).collect()}
    assert out == {1: 10, 2: 10, 3: 11, 4: 12}  # 3 is exactly on the boundary → upper band; 5 unmatched


def test_range_join_left_keeps_unmatched(spark):
    points, intervals = _fixtures(spark)
    out = {
        r["pid"]: r["iid"]
        for r in range_join(points, intervals, "v", "lo", "hi", bucket_width=50000, how="left").collect()
    }
    assert out[5] is None and len(out) == 5


def test_range_join_wide_intervals_replicate(spark):
    points, intervals = _fixtures(spark)
    wide = spark.createDataFrame([(20, 0.0, 200000.0)], "iid int, lo double, hi double")
    out = {r["pid"] for r in range_join(points, wide, "v", "lo", "hi", bucket_width=50000).collect()}
    assert out == {1, 2, 3, 4}  # interval spans 4 buckets, all matching points found


def test_as_of_join_duplicate_left_timestamps(spark):
    import datetime as dt

    from batch_data_pipeline_exercise_spark.operators.asof import as_of_join

    left = spark.createDataFrame(
        [("k", dt.datetime(2021, 1, 5), "La"), ("k", dt.datetime(2021, 1, 5), "Lb")],
        "k string, lt timestamp, lbl string",
    )
    right = spark.createDataFrame(
        [("k", dt.datetime(2021, 1, 4), 1)],
        "k string, rt timestamp, rid int",
    )
    out = as_of_join(left, right, on="k", left_ts="lt", right_ts="rt").collect()
    assert len(out) == 2 and all(r["rid"] == 1 for r in out)  # both left rows matched, none lost
