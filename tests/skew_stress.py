"""Skew stress — round-9 evidence script behind
``evidence/SKEWSTRESS_r09.jsonl`` (verdict task 4).

The salted operators (``operators/skew.py``) are oracle-checked on
NATURAL key distributions; this run measures them on a deliberately
skewed sf1 variant (``tests/gen_skew_data.py``: one l_partkey ≈30% of
lineitem, one user_id ≈30% of events) and records, per variant,

    {"variant", "wall_s", "cpu_s", "max_task_s", "p50_task_s",
     "skew_ratio", "rows"}

where ``max_task_s`` is the longest single task (REST taskSummary,
quantile 1.0) across the variant's stages and ``skew_ratio`` =
max/median task duration of its WORST stage — the straggler factor a
1000-executor cluster would idle on.

Variants:

- ``brand_rev_plain_noskew`` — the unsalted lineitem⋈part join with
  autoBroadcastJoinThreshold=-1 (simulating a dim too big to broadcast,
  the exact premise of ``salted_join``) AND AQE skew-join disabled:
  the naive plan; the hot key lands in one sort-merge reduce task.
- ``brand_rev_plain_aqeskew`` — same, AQE skew-join enabled: Spark's
  own runtime mitigation (splits the skewed partition by map-output
  size); the fair in-engine baseline.
- ``brand_rev_salted`` — the registry's ``salted_brand_revenue``
  (8-way salt, dim replicated), broadcast likewise disabled.
- ``user_sessions`` / ``scd2_incremental_intervals`` — hot-user window
  queries. Sessionization is order-dependent per key, so a hot key is
  INHERENTLY one task's work (salting would change semantics); recorded
  to quantify that straggler honestly rather than hide it.

Every variant's output is checked against its DuckDB oracle on the
skewed parquet — mitigation must be invisible in the result.

Usage: python tests/skew_stress.py [skew_dir] [out_jsonl]
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from batch_data_pipeline_exercise_spark.plans import contract  # noqa: E402
from batch_data_pipeline_exercise_spark.plans import (  # noqa: F401,E402
    contract2,
    contract3,
    contract4,
    contract5,
    contract6,
    contract_ext,
)
from batch_data_pipeline_exercise_spark.plans.contract import dec, load  # noqa: E402
from batch_data_pipeline_exercise_spark.session import get_spark  # noqa: E402
from tests.run_sweep import _row_key, duck_connect  # noqa: E402
from bench import _settled_totals  # noqa: E402


def _app_id(ui_url: str) -> str:
    with urllib.request.urlopen(f"{ui_url}/api/v1/applications", timeout=5) as r:
        return json.load(r)[0]["id"]


def _completed_stages(ui_url: str, app_id: str) -> list[dict]:
    url = f"{ui_url}/api/v1/applications/{app_id}/stages?status=complete"
    with urllib.request.urlopen(url, timeout=5) as r:
        return json.load(r)


def _task_quantiles(ui_url: str, app_id: str, sid: int, att: int) -> tuple[float, float] | None:
    """(max, median) task DURATION seconds for one stage."""
    url = (
        f"{ui_url}/api/v1/applications/{app_id}/stages/{sid}/{att}"
        "/taskSummary?quantiles=0.5,1.0"
    )
    try:
        with urllib.request.urlopen(url, timeout=5) as r:
            ts = json.load(r)
        med, mx = ts["duration"]
        return mx / 1e3, med / 1e3
    except Exception:
        return None


def measure(spark, fn, label: str, oracle_sql: str | None, con) -> dict:
    ui = spark.sparkContext.uiWebUrl
    app = _app_id(ui)
    _settled_totals(ui)  # settle the status store before snapshotting
    seen = {(s["stageId"], s["attemptId"]) for s in _completed_stages(ui, app)}
    before = _settled_totals(ui)
    t0 = time.perf_counter()
    df = fn()
    df.write.mode("overwrite").format("noop").save()
    wall = time.perf_counter() - t0
    after = _settled_totals(ui)
    worst = (0.0, 0.0)  # stage with the longest single task: (max, med)
    # stage with the worst straggler RATIO among multi-task stages — the
    # scan/sort stages have uniformly chunky tasks, so the global-max
    # stage can hide a 10x-skewed reduce stage whose median is tiny
    worst_ratio = (0.0, 0.0, 0.0, "")  # (ratio, max, med, name)
    for s in _completed_stages(ui, app):
        key = (s["stageId"], s["attemptId"])
        if key in seen or s.get("numCompleteTasks", 0) == 0:
            continue
        q = _task_quantiles(ui, app, *key)
        if q is None:
            continue
        if q[0] > worst[0]:
            worst = q
        if s["numCompleteTasks"] >= 8 and q[1] > 0 and q[0] / q[1] > worst_ratio[0]:
            worst_ratio = (q[0] / q[1], q[0], q[1], f"stage {key[0]} ({s['numCompleteTasks']} tasks)")
    rec = {
        "variant": label,
        "wall_s": round(wall, 2),
        "cpu_s": round(after["cpu"] - before["cpu"], 2) if before and after else None,
        "max_task_s": round(worst[0], 2),
        "p50_task_s": round(worst[1], 3),
        "skew_stage": worst_ratio[3],
        "skew_stage_max_s": round(worst_ratio[1], 2),
        "skew_stage_p50_s": round(worst_ratio[2], 3),
        "skew_ratio": round(worst_ratio[0], 1) if worst_ratio[0] else None,
    }
    if oracle_sql is not None:
        srows = sorted((tuple(r) for r in df.collect()), key=_row_key)
        drows = sorted(map(tuple, con.execute(oracle_sql).fetchall()), key=_row_key)
        rec["rows"] = len(srows)
        rec["match"] = srows == drows
    print(json.dumps(rec), flush=True)
    return rec


def plain_brand_revenue(spark, sf_dir: str):
    """The unsalted twin of salted_brand_revenue — identical semantics,
    plain equi-join, so the oracle and output contract are shared."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").select(F.col("p_partkey").alias("l_partkey"), "p_brand")
    rev = dec("l_extendedprice") * (F.lit(1).cast("decimal(4,2)") - dec("l_discount", 4, 2))
    return li.join(p, "l_partkey").groupBy(F.col("p_brand").alias("brand")).agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(rev).cast("double").alias("revenue"),
    )


def main() -> None:
    skew_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1skew"
    out_path = Path(sys.argv[2]) if len(sys.argv) > 2 else REPO / "evidence" / "SKEWSTRESS_r09.jsonl"
    spark = get_spark(
        app_name="skew-stress",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={"spark.ui.retainedStages": "100000", "spark.ui.retainedJobs": "100000"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_connect(skew_dir)
    R = contract.REGISTRY
    recs = []

    # warmup (JVM/codegen)
    plain_brand_revenue(spark, skew_dir).write.mode("overwrite").format("noop").save()

    # dim-too-big-to-broadcast premise for all three brand-revenue runs
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    oracle = R["salted_brand_revenue"].oracle

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    recs.append(measure(spark, lambda: plain_brand_revenue(spark, skew_dir),
                        "brand_rev_plain_noskew", oracle, con))
    # fair in-engine baseline: AQE skew-join with its size gates scaled to
    # the demo data (the default 256 MB skewedPartitionThresholdInBytes is
    # sized for production shuffles; the hot partition here is ~hundreds of
    # MB of a ~1 GB shuffle — the same RELATIVE skew a 100 TB run shows
    # over the default gates)
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16m")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
    recs.append(measure(spark, lambda: plain_brand_revenue(spark, skew_dir),
                        "brand_rev_plain_aqeskew", oracle, con))
    spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
    spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
    recs.append(measure(spark, lambda: R["salted_brand_revenue"].fn(spark, skew_dir),
                        "brand_rev_salted", oracle, con))
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")

    for qname in ("user_sessions", "scd2_incremental_intervals"):
        recs.append(measure(spark, lambda n=qname: R[n].fn(spark, skew_dir), qname,
                            R[qname].oracle, con))

    out_path.parent.mkdir(exist_ok=True)
    with out_path.open("w") as f:
        for r in recs:
            f.write(json.dumps(r) + "\n")
    assert all(r.get("match") is True for r in recs), "oracle mismatch on skewed data"
    spark.stop()


if __name__ == "__main__":
    main()
