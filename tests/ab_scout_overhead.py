#!/usr/bin/env python
"""Round-10 task: quiet-box A/B of the always-on guardrail costs inside
``similarity.embedding_near_dup_pairs`` (the round-9 driver bench showed
the query at 19.1 CPU s vs 11.98 in round 8 at sf0.1, with SCALE.md
attributing ~1-4 CPU s to the new narrow count shuffle and the rest to
box load — but no single-query quiet-box A/B existed).

Four variants, identical output pair sets (asserted), each measured with
bench.py's settled UI counters (mean of 3 runs, min wall), clean session
state between variants:

  full      — the shipped operator: bucket-cap occupancy count +
              broadcast-gate probe (first + LIMIT-capped count)
  no_cap    — plain band-key self-join (no over-bucket count shuffle),
              verify unchanged (probe on)
  no_probe  — bucket-cap path unchanged, verify broadcast forced
              (no probe actions)
  bare      — both removed: plain self-join + forced-broadcast verify

full - no_cap  prices the per-(band,key) occupancy count that feeds the
SIGN_BUCKET_CAP chunk-split; full - no_probe prices the broadcast-gate
sizing actions. Decision rule from the round-9 verdict: if either
guardrail costs >10% of the query at small corpora, gate it on a cheap
row-count threshold.

Usage: python tests/ab_scout_overhead.py <sf_dir> <label>
Writes JSON lines (one per variant) to stdout — append to
evidence/ABSCOUT_r10.jsonl. Data recipe for non-shipped dirs:
``python tests/gen_sf_scale.py /tmp/sf1 10`` (SRC=/root/testdata/sf0.1).
Params pinned below: threshold=0.4, bands=8, rows_per_band=8, seed=42,
dim=64 — identical to the registry query.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

import bench
from batch_data_pipeline_exercise_spark.operators import similarity
from batch_data_pipeline_exercise_spark.plans.contract import load
from batch_data_pipeline_exercise_spark.session import get_spark

PARAMS = dict(threshold=0.4, bands=8, rows_per_band=8, seed=42, dim=64)


def _sketch_bk(e):
    vecs = similarity.banded_sign_sketch(
        e, PARAMS["bands"], PARAMS["rows_per_band"], PARAMS["seed"], dim=PARAMS["dim"]
    )
    return vecs, similarity._explode_band_keys(vecs)


def _plain_pairs(bk):
    return (
        bk.alias("a")
        .join(bk.alias("b"), ["band", "key"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id1"), F.col("b.id").alias("id2"))
        .distinct()
    )


def _forced_broadcast_verify(cand, vecs):
    va = vecs.select(F.col("id").alias("id1"), F.col("__v").alias("__va"), F.col("__n").alias("__na"))
    vb = vecs.select(F.col("id").alias("id2"), F.col("__v").alias("__vb"), F.col("__n").alias("__nb"))
    va, vb = F.broadcast(va), F.broadcast(vb)
    return (
        cand.join(va, "id1")
        .join(vb, "id2")
        .select(
            "id1",
            "id2",
            (
                similarity._dot(F.col("__va").cast("array<double>"), F.col("__vb").cast("array<double>"))
                / (F.col("__na") * F.col("__nb"))
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= PARAMS["threshold"])
    )


def variant_full(e):
    return similarity.embedding_near_dup_pairs(e, **PARAMS)


def variant_no_cap(e):
    vecs, bk = _sketch_bk(e)
    return similarity._verify_cosine_pairs(_plain_pairs(bk), vecs, PARAMS["threshold"])


def variant_no_probe(e):
    vecs, bk = _sketch_bk(e)
    return _forced_broadcast_verify(similarity._bucketed_self_pairs(bk).distinct(), vecs)


def variant_bare(e):
    vecs, bk = _sketch_bk(e)
    return _forced_broadcast_verify(_plain_pairs(bk), vecs)


VARIANTS = {
    "full": variant_full,
    "no_cap": variant_no_cap,
    "no_probe": variant_no_probe,
    "bare": variant_bare,
}


def main() -> None:
    sf_dir, label = sys.argv[1], sys.argv[2]
    spark = get_spark(
        app_name="ab-scout-overhead",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={"spark.ui.retainedStages": "100000", "spark.ui.retainedJobs": "100000"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl

    e = load(spark, sf_dir, "embeddings")

    # correctness pin: all four variants emit the identical pair set
    base = None
    for name, fn in VARIANTS.items():
        got = {(r["id1"], r["id2"]) for r in fn(e).select("id1", "id2").collect()}
        if base is None:
            base = got
        assert got == base, f"{name}: pair set diverged ({len(got)} vs {len(base)})"
        bench._clear_session_state(spark)

    # warmup then measure
    VARIANTS["full"](e).write.mode("overwrite").format("noop").save()
    bench._clear_session_state(spark)
    prev = bench._settled_totals(ui)
    for name, fn in VARIANTS.items():
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            fn(e).write.mode("overwrite").format("noop").save()
            best = min(best, time.perf_counter() - t0)
        bench._clear_session_state(spark)
        cur = bench._settled_totals(ui)
        delta = {k: round((cur[k] - prev[k]) / 3, 3) for k in ("cpu", "shuffle_mb", "input_mb")}
        prev = cur
        print(
            json.dumps(
                {
                    "harness": "tests/ab_scout_overhead.py",
                    "label": label,
                    "sf_dir": sf_dir,
                    "variant": name,
                    "wall": round(best, 3),
                    **delta,
                    "n_pairs": len(base),
                    "params": PARAMS,
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
