"""One-off evidence probe for the auto-escalating embedding sketch
(r13 verdict task 3): the verdict's literal scenario — 600k synthetic
vectors handed to ``embedding_near_dup_pairs`` at the PINNED 8x8 config
with a 50M candidate budget and ``on_over_budget="resize"`` — must
auto-run at the model pick with the audit block recording it, instead of
refusing the way the default mode (correctly) still does.

Appends JSONL records to ``evidence/AUTORESIZE_r{N}.jsonl``:

  {"probe": "resize",  "n": 600000, "requested": "8x8",
   "effective": "<b>x<r>", "resized": true, "model_first_pick": "12x16",
   "n_pairs": ..., "planted_pairs_recovered": ..., "wall_sec": ...}
  {"probe": "refusal_control", "raised": true, "quotes_suggestion": true}

Vectors: deterministic centered 100k-grid components (xxhash64), dim 64
(the registry corpus width), with every 100th tail id duplicating an
early vector so the verified-pair set is non-trivial and the planted
pairs give a recall floor an escalation cannot silently breach (exact
dups collide in every band at any sketch width).

Usage:  python tests/auto_resize_probe.py [out.jsonl]
Runs on local[32]; a multi-minute job (three sketch passes + a ~40M-pair
verify at dim 64 — this IS the 100x-scale workload, which is why the
suite pins the same path at 60k in tests/test_auto_resize.py instead).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from batch_data_pipeline_exercise_spark.operators import similarity  # noqa: E402
from batch_data_pipeline_exercise_spark.session import get_spark  # noqa: E402

N, DIM, BUDGET = 600_000, 64, 50_000_000


def vectors(spark):
    tail_start = N - N // 100
    src = F.when(
        F.col("id") >= tail_start, (F.col("id") - tail_start) * 100
    ).otherwise(F.col("id"))
    return spark.range(0, N, 1, 64).select(
        F.col("id").alias("vec_id"),
        F.array(
            *[
                (F.pmod(F.xxhash64(src, F.lit(i)), F.lit(100_000)) / F.lit(50_000.0) - 1.0)
                for i in range(DIM)
            ]
        ).alias("embedding"),
    )


def main() -> None:
    out = Path(sys.argv[1]) if len(sys.argv) > 1 else REPO / "evidence" / "AUTORESIZE_r14.jsonl"
    out.parent.mkdir(exist_ok=True)
    spark = get_spark(
        app_name="auto-resize-probe", master="local[32]", shuffle_partitions=32
    )
    spark.sparkContext.setLogLevel("ERROR")
    e = vectors(spark).localCheckpoint()  # freeze inputs: both runs see one corpus

    p = similarity.cosine_collision_p(0.95)
    model_b, model_r, model_rec = similarity.auto_sized_sketch_pick(
        N, BUDGET, p, min_rows=9
    )

    t0 = time.time()
    res = similarity.embedding_near_dup_pairs(
        e, threshold=0.95, bands=8, rows_per_band=8, seed=42, dim=DIM,
        max_candidates=BUDGET, on_over_budget="resize",
    )
    agg = res.groupBy(
        "requested_bands", "requested_rows", "sketch_bands", "sketch_rows", "sketch_resized"
    ).count().collect()
    assert len(agg) == 1, f"audit must be one constant block, got {agg}"
    a = agg[0]
    tail_start = N - N // 100
    planted = res.filter(
        (F.col("id2") >= tail_start) & (F.col("id1") == (F.col("id2") - tail_start) * 100)
    ).count()
    rec = {
        "probe": "resize",
        "n": N, "dim": DIM, "budget": BUDGET,
        "requested": f"{a['requested_bands']}x{a['requested_rows']}",
        "effective": f"{a['sketch_bands']}x{a['sketch_rows']}",
        "resized": bool(a["sketch_resized"]),
        "model_first_pick": f"{model_b}x{model_r}",
        "model_first_pick_recall": round(model_rec, 4),
        "n_pairs": a["count"],
        "planted_pairs_expected": sum(1 for i in range(N // 100) if i * 100 < tail_start),
        "planted_pairs_recovered": planted,
        "wall_sec": round(time.time() - t0, 1),
    }
    with out.open("a") as fh:
        fh.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))

    # control: the default mode still refuses, quoting the sized suggestion
    try:
        similarity.embedding_near_dup_pairs(
            e, threshold=0.95, bands=8, rows_per_band=8, seed=42, dim=DIM,
            max_candidates=BUDGET,
        )
        ctl = {"probe": "refusal_control", "raised": False}
    except similarity.LshCandidateBudgetError as err:
        ctl = {
            "probe": "refusal_control", "raised": True,
            "quotes_suggestion": "Resize the sketch" in str(err),
            "err_head": str(err)[:160],
        }
    with out.open("a") as fh:
        fh.write(json.dumps(ctl) + "\n")
    print(json.dumps(ctl))
    spark.stop()


if __name__ == "__main__":
    main()
