"""Deterministic sampling / splitting / packing operator tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from batch_data_pipeline_exercise_spark.operators import sampling


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, f"g{i % 3}", 100 + (i * 37) % 900) for i in range(2000)]
    return spark.createDataFrame(rows, "doc_id bigint, grp string, n_tokens int").cache()


def test_hash_split_proportions_and_stability(spark, docs):
    out = sampling.with_hash_split(docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}, seed="s")
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert 0.75 < counts["train"] / 2000 < 0.85
    assert 0.06 < counts["val"] / 2000 < 0.14

    # growth stability: the first 1000 docs keep their split when 1000 more appear
    small = sampling.with_hash_split(docs.filter("doc_id < 1000"), "doc_id",
                                     {"train": 0.8, "val": 0.1, "test": 0.1}, seed="s")
    a = dict(small.select("doc_id", "split").collect())
    b = dict(out.filter("doc_id < 1000").select("doc_id", "split").collect())
    assert a == b
    # different seed → different assignment (at least somewhere)
    other = sampling.with_hash_split(docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}, seed="t")
    diff = out.alias("a").join(other.alias("b"), "doc_id").filter(F.col("a.split") != F.col("b.split")).count()
    assert diff > 0


def test_deterministic_sample_is_subset_stable(spark, docs):
    s1 = {r["doc_id"] for r in sampling.deterministic_sample(docs, "doc_id", 0.2).select("doc_id").collect()}
    s2 = {r["doc_id"] for r in sampling.deterministic_sample(docs, "doc_id", 0.2).select("doc_id").collect()}
    assert s1 == s2  # rerun identical (df.sample would not be)
    assert 0.14 < len(s1) / 2000 < 0.26
    # smaller fraction is a SUBSET of larger (nested samples property)
    s_small = {r["doc_id"] for r in sampling.deterministic_sample(docs, "doc_id", 0.05).select("doc_id").collect()}
    assert s_small <= s1


def test_stratified_topk_exact_quota(spark, docs):
    out = sampling.stratified_sample_topk(docs, ["grp"], "doc_id", k=10)
    counts = {r["grp"]: r["n"] for r in out.groupBy("grp").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts == {"g0": 10, "g1": 10, "g2": 10}
    # deterministic: same rows every run
    again = sampling.stratified_sample_topk(docs, ["grp"], "doc_id", k=10)
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))
    # small stratum yields all its rows, not an error
    tiny = docs.filter("doc_id < 4")
    assert sampling.stratified_sample_topk(tiny, ["grp"], "doc_id", k=10).count() == 4


def test_null_keys_cross_engine_consistent(spark):
    """NULL keys: dropped by deterministic_sample, last split in
    with_hash_split, quota leftovers in stratified — mirroring the SQL
    oracles where '||' propagates NULL (concat_ws alone would not)."""
    df = spark.createDataFrame([(None, "g0"), (1, "g0"), (2, "g0")], "doc_id bigint, grp string")
    kept = sampling.deterministic_sample(df, "doc_id", 0.9999).select("doc_id").collect()
    assert None not in {r["doc_id"] for r in kept}
    split = dict(
        sampling.with_hash_split(df, "doc_id", {"train": 0.5, "test": 0.5}).select("doc_id", "split").collect()
    )
    assert split[None] == "test"  # last split, deterministically
    top = sampling.stratified_sample_topk(df, ["grp"], "doc_id", k=2).select("doc_id").collect()
    assert None not in {r["doc_id"] for r in top}  # non-null rows win the quota


def test_global_dense_rank_keeps_null_values(spark):
    from batch_data_pipeline_exercise_spark.operators import ranking

    df = spark.createDataFrame([("b",), (None,), ("a",), ("b",)], "v string")
    out = ranking.with_global_dense_rank(df, "v", "rk")
    got = sorted(((r["v"], r["rk"]) for r in out.collect()),
                 key=lambda t: (t[0] is not None, t[0] or "", t[1]))
    # NULL ranks first (Spark DENSE_RANK semantics), nothing dropped
    assert got == [(None, 1), ("a", 2), ("b", 3), ("b", 3)]


def test_packing_bins_respect_budget(spark, docs):
    out = sampling.assign_packing_bins(
        docs, size_col="n_tokens", budget=5000, order_cols=["doc_id"], partition_cols=["grp"]
    )
    sums = out.groupBy("grp", "bin").agg(F.sum("n_tokens").alias("s"), F.count(F.lit(1)).alias("n"))
    # a bin only exceeds the budget by less than its last row's size ⇒
    # sum - max_row < budget always; with max n_tokens < 1000:
    assert sums.filter(F.col("s") >= 5000 + 1000).count() == 0
    # bins are contiguous 0..max per group
    per_grp = out.groupBy("grp").agg(F.max("bin").alias("mx"), F.count_distinct("bin").alias("nd")).collect()
    assert all(r["nd"] == r["mx"] + 1 for r in per_grp)
    # unpartitioned call is refused (scale guard)
    with pytest.raises(ValueError, match="partition_cols"):
        sampling.assign_packing_bins(docs, "n_tokens", 5000, ["doc_id"])
