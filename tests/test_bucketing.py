"""Bucketed co-located join: the shuffle-free big-big join strategy.

At 100 TB the lineitem↔orders join is the dominant shuffle; bucketing
both tables by the join key at write time removes it entirely — each
task reads matching buckets from both sides. This test proves the plan
shape: a SortMergeJoin with NO exchange on either side.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").mode("overwrite").saveAsTable("li_bucketed")
    o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").mode("overwrite").saveAsTable("o_bucketed")
    yield
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")


def test_bucketed_join_has_no_exchange(spark, bucketed):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li, o = spark.table("li_bucketed"), spark.table("o_bucketed")
        j = li.join(o, li.l_orderkey == o.o_orderkey).groupBy("o_orderstatus").count()
        plan = j._jdf.queryExecution().executedPlan().toString()
        # co-located: the join itself needs no shuffle on either side
        join_part = plan.split("HashAggregate")[-1]
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in join_part, plan
        # and it still computes the right thing
        got = {r["o_orderstatus"]: r["count"] for r in j.collect()}
        li_raw = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        o_raw = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        want = {
            r["o_orderstatus"]: r["count"]
            for r in li_raw.join(o_raw, li_raw.l_orderkey == o_raw.o_orderkey)
            .groupBy("o_orderstatus")
            .count()
            .collect()
        }
        assert got == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
