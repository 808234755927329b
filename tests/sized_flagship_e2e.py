#!/usr/bin/env python
"""Round-11 task 6: quantify the sized-config effect on the WHOLE
flagship (`corpus_prep_pipeline`) — survivor stage included — plus the
downstream deltas a training-data owner actually feels: canonical
survivor count, total tokens surviving, and the 8-shard assignment
profile of the output.

Round 10 sized only the near-dup TAIL and its resize pick (64/8) was
occupancy-only: at 8 rows/band a Jaccard-0.7 pair band-collides with
p=0.7^8=5.8% per band, so 8 bands catch it with probability 0.38 — the
resize silently forfeited ~49% of threshold-proximal verified pairs
(evidence/SIZEDFLAG_r10.jsonl). The round-11 recall-aware model
(`similarity.bands_rows_for`) refuses that trade: at threshold 0.7 /
recall floor 0.9 it picks bands=13 x rows=5 (k=65) under a 16k
occupancy target — predicted recall 0.909, ABOVE the shipped 32/8's
0.889, while each band's sub-threshold (J~=0.33 splice-sibling)
collision odds drop 3x (0.33^5 vs 0.33^4). The strict 256-occupancy
floor at 472k docs demands 116x11 (k=1276) — stated, not run: a
1276-column aggregate is past practical codegen, which is exactly the
kind of infeasibility the model surfaces BEFORE a cluster run.

Per config this harness runs the full pipeline end-to-end (fresh
session per config — SCALE.md session-lifetime discipline), recording
wall + settled executor CPU / shuffle / input over the WHOLE run, the
verified-pair and output fingerprints, and the downstream stats.

Usage: python tests/sized_flagship_e2e.py <sf_dir> <label> [bands/rows ...]
Default configs: 8/4 (= shipped 32/8), 13/5 (model pick), 8/8 (r10 resize).
Appends one JSON line per config — evidence/SIZEDFLAG_E2E_r11.jsonl.
Data recipe: python tests/gen_sf_scale.py /tmp/sfN <factor> (sf10=100).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

import bench
from batch_data_pipeline_exercise_spark.operators import dedup, graph
from batch_data_pipeline_exercise_spark.operators.similarity import lsh_recall
from batch_data_pipeline_exercise_spark.plans.contract_ext import corpus_prep_survivors
from batch_data_pipeline_exercise_spark.session import get_spark

THRESHOLD = 0.7
DEFAULT_CONFIGS = ((8, 4), (13, 5), (8, 8))


def main() -> None:
    sf_dir, label = sys.argv[1], sys.argv[2]
    configs = (
        [tuple(int(x) for x in a.split("/")) for a in sys.argv[3:]]
        if len(sys.argv) > 3
        else list(DEFAULT_CONFIGS)
    )
    for bands, rows in configs:
        k = bands * rows
        spark = get_spark(
            app_name="sized-flagship-e2e",
            master="local[32]",
            shuffle_partitions=32,
            extra_conf={"spark.ui.retainedStages": "100000", "spark.ui.retainedJobs": "100000"},
        )
        spark.sparkContext.setLogLevel("ERROR")
        ui = spark.sparkContext.uiWebUrl

        prev = bench._settled_totals(ui)
        t0 = time.perf_counter()
        kept1 = corpus_prep_survivors(spark, sf_dir)
        ver = dedup.minhash_near_dups(
            kept1.select("doc_id", "text"), "doc_id", n=3, k=k, bands=bands,
            threshold=THRESHOLD,
        ).localCheckpoint()
        clusters = graph.dedup_clusters(ver.select("id1", "id2"), kept1.select("doc_id"))
        out = (
            kept1.join(clusters, "doc_id")
            .filter(F.col("doc_id") == F.col("cluster"))
            .select("doc_id", "quality_score", "n_tokens")
            .localCheckpoint()
        )
        # downstream profile in ONE aggregate job over the pinned output:
        # survivor count, token total, verified-pair + output fingerprints,
        # and the 8-shard split the corpus pipeline would assign
        shard = F.pmod(F.xxhash64(F.col("doc_id")), F.lit(8)).cast("int")
        row = (
            out.withColumn("shard", shard)
            .groupBy("shard").agg(
                F.count(F.lit(1)).alias("n"), F.sum("n_tokens").alias("tok")
            )
            .agg(
                F.sum("n").alias("n_out"),
                F.sum("tok").alias("tokens_total"),
                F.count(F.lit(1)).alias("n_shards"),
                F.min("n").alias("min_shard_docs"),
                F.max("n").alias("max_shard_docs"),
                F.min("tok").alias("min_shard_tokens"),
                F.max("tok").alias("max_shard_tokens"),
            )
            .first()
        )
        vrow = ver.agg(
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(F.xxhash64("id1", "id2")).alias("h"),
        ).first()
        orow = out.agg(
            F.bit_xor(F.xxhash64("doc_id", "quality_score", "n_tokens")).alias("h")
        ).first()
        wall = time.perf_counter() - t0
        cur = bench._settled_totals(ui)
        delta = {m: round(cur[m] - prev[m], 3) for m in ("cpu", "shuffle_mb", "input_mb")}
        rec = {
            "harness": "tests/sized_flagship_e2e.py",
            "label": label,
            "sf_dir": sf_dir,
            "bands": bands,
            "rows_per_band": rows,
            "k": k,
            "predicted_recall_at_0.7": round(lsh_recall(THRESHOLD, bands, rows), 4),
            "run": {"wall": round(wall, 3), **delta},
            "verified_pairs": {"n": int(vrow["n"] or 0), "xor64": int(vrow["h"] or 0)},
            "output": {
                "n": int(row["n_out"] or 0),
                "xor64": int(orow["h"] or 0),
                "tokens_total": int(row["tokens_total"] or 0),
                "n_shards": int(row["n_shards"] or 0),
                "shard_docs_min_max": [int(row["min_shard_docs"] or 0), int(row["max_shard_docs"] or 0)],
                "shard_tokens_min_max": [int(row["min_shard_tokens"] or 0), int(row["max_shard_tokens"] or 0)],
            },
            "threshold": THRESHOLD,
            "shingle_n": 3,
        }
        print(json.dumps(rec), flush=True)
        spark.stop()


if __name__ == "__main__":
    main()
