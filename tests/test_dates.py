from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from batch_data_pipeline_exercise_spark.plans.dates import build_dim_dates


def test_dim_dates_shape_and_edges(spark):
    dim = build_dim_dates(spark).cache()
    assert dim.count() == 29220
    assert dim.select("id").distinct().count() == 29220

    first = dim.orderBy("datum").first()
    assert first["id"] == "19700101"
    assert first["datum"] == dt.date(1970, 1, 1)
    assert first["day_of_month"] == 1 and first["day_of_year"] == 1
    assert first["quarter"] == 1 and first["year"] == 1970

    # leap-day attributes
    leap = dim.filter(F.col("id") == "20200229").first()
    assert leap is not None
    assert leap["day_of_month"] == 29
    assert leap["day_of_year"] == 60
    assert leap["first_day_of_month"] == dt.date(2020, 2, 1)
    assert leap["last_day_of_month"] == dt.date(2020, 2, 29)
    assert leap["first_day_of_next_month"] == dt.date(2020, 3, 1)
    dim.unpersist()
