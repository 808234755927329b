"""Data-quality constraint validation (operators/quality.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from batch_data_pipeline_exercise_spark.operators import quality as Q


def _report(df):
    return {(r["check"], r["column"]): (r["n_violations"], r["passed"]) for r in df.collect()}


def test_validate_one_pass_checks(spark):
    df = spark.createDataFrame(
        [
            (1, "O", 10.0),
            (2, "F", -5.0),  # range violation
            (2, "X", 50.0),  # duplicate key + bad status
            (None, "O", 20.0),  # null key (not a unique violation: NULLs excluded)
            (4, None, 999.0),  # null status is NOT an accepted_values violation
        ],
        ["k", "status", "price"],
    )
    rep = _report(
        Q.validate(
            df,
            [
                Q.not_null("k"),
                Q.unique("k"),
                Q.accepted_values("status", ["O", "F", "P"]),
                Q.in_range("price", 0, 100),
                Q.expression("price", F.col("price") != 999.0),
            ],
        )
    )
    assert rep[("not_null", "k")] == (1, False)
    assert rep[("unique", "k")] == (1, False)
    assert rep[("accepted_values", "status")] == (1, False)
    assert rep[("in_range", "price")] == (2, False)  # -5 and 999
    assert rep[("expression", "price")] == (1, False)


def test_validate_all_green(spark):
    df = spark.createDataFrame([(1, "O"), (2, "F")], ["k", "status"])
    rep = _report(Q.validate(df, [Q.not_null("k"), Q.unique("k"), Q.accepted_values("status", ["O", "F"])]))
    assert all(v == (0, True) for v in rep.values())


def test_validate_single_aggregate_pass(spark):
    # all row-level checks must compile into ONE aggregate — no per-check scan
    df = spark.createDataFrame([(1, "O")], ["k", "status"])
    plan = (
        Q.validate(df, [Q.not_null("k"), Q.unique("k"), Q.accepted_values("status", ["O"])])
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    assert plan.lower().count("logicalrdd") == 1


def test_referential_check(spark):
    child = spark.createDataFrame([(1, 10), (2, 11), (3, 99), (4, None)], ["id", "fk"])
    parent = spark.createDataFrame([(10,), (11,)], ["pk"])
    rep = _report(Q.referential_check(child, "fk", parent, "pk"))
    # fk=99 is orphaned; NULL fk is exempt
    assert rep[("referential", "fk")] == (1, False)

    ok = _report(Q.referential_check(child.filter(F.col("fk").isin(10, 11)), "fk", parent, "pk"))
    assert ok[("referential", "fk")] == (0, True)


def test_observe_load_metrics_single_pass(spark, tmp_path):
    """Observation metrics computed during the write equal a direct
    aggregate — and the metrics job IS the write job (no second scan)."""
    from pyspark.sql import functions as F

    from batch_data_pipeline_exercise_spark.operators import quality

    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, 30.0), (4, None), (5, 50.0)], "id int, v double"
    )
    observed, obs = quality.observe_load_metrics(
        df,
        {
            "n_rows": F.count(F.lit(1)),
            "null_v": F.sum(F.when(F.col("v").isNull(), 1).otherwise(0)),
            "v_sum": F.sum("v"),
            "id_max": F.max("id"),
        },
    )
    observed.write.mode("overwrite").parquet(str(tmp_path / "out"))
    got = obs.get
    assert got["n_rows"] == 5 and got["null_v"] == 2
    assert got["v_sum"] == 90.0 and got["id_max"] == 5
    # the written data is untouched by the observation
    assert spark.read.parquet(str(tmp_path / "out")).count() == 5
