"""Stream-stream interval join (streaming/joins.py): watermarked
attribution join drained with availableNow, checked against the
identical plan run in batch."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType, TimestampType

from batch_data_pipeline_exercise_spark.streaming.joins import clicks_before_purchases

SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", LongType()),
        StructField("ts", TimestampType()),
    ]
)

CLICKS = [
    (1, 10, "2021-03-02 10:00:00"),
    (2, 10, "2021-03-02 10:40:00"),
    (3, 10, "2021-03-02 12:00:00"),  # later than any purchase → no match
    (4, 11, "2021-03-02 09:00:00"),  # >1h before 11's purchase → outside window
    (5, 12, "2021-03-02 10:30:00"),  # user with no purchase
]
PURCHASES = [
    (100, 10, "2021-03-02 11:00:00"),  # matches clicks 1 (exactly -1h) and 2
    (101, 11, "2021-03-02 10:30:00"),  # click 4 is 1.5h earlier → no match
]


def _write_json(rows, path):
    path.mkdir(parents=True)
    with open(path / "part.json", "w") as f:
        for eid, uid, ts in rows:
            f.write(json.dumps({"event_id": eid, "user_id": uid, "ts": ts}) + "\n")


@pytest.fixture()
def dirs(tmp_path):
    _write_json(CLICKS, tmp_path / "clicks")
    _write_json(PURCHASES, tmp_path / "purchases")
    return tmp_path


def _expected():
    return {(10, 100, 1), (10, 100, 2)}


def test_stream_stream_interval_join_availablenow(spark, dirs):
    clicks = spark.readStream.schema(SCHEMA).json(str(dirs / "clicks"))
    purchases = spark.readStream.schema(SCHEMA).json(str(dirs / "purchases"))
    joined = clicks_before_purchases(clicks, purchases, window="1 hour")
    q = (
        joined.writeStream.format("memory")
        .queryName("attrib")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM attrib").collect()
    got = {(r["user_id"], r["purchase_event_id"], r["click_event_id"]) for r in rows}
    assert got == _expected()


def test_same_plan_in_batch_matches(spark, dirs):
    clicks = spark.read.schema(SCHEMA).json(str(dirs / "clicks"))
    purchases = spark.read.schema(SCHEMA).json(str(dirs / "purchases"))
    rows = clicks_before_purchases(clicks, purchases, window="1 hour").collect()
    got = {(r["user_id"], r["purchase_event_id"], r["click_event_id"]) for r in rows}
    assert got == _expected()
