#!/usr/bin/env python
"""Heap-behavior evidence for the session-recycle knob (round-10
verdict task 5): drive the SAME multi-day corpus-pipeline workload with
``recycle_session_every`` off vs on, recording the driver JVM's used
heap after every day (post-``Runtime.gc()`` so the number is retained
state, not collectable garbage).

Local mode puts driver + executors in ONE JVM, so this measures exactly
the accumulation the README documents (localCheckpoint blocks and other
session state ``_clear_session_state`` cannot drop). With the knob on,
the JVM is replaced every N days and the curve resets; without it, the
floor ratchets upward day over day.

Day recipe: equal slices of the sf3 replica-dense documents table
(deterministic doc_id ranges), full-coverage deterministic embeddings —
big enough days (~15k docs) that each run pins real checkpoint blocks.

Usage: python tests/recycle_probe.py [out_jsonl] [sf_dir] [days] [docs_per_day]
"""

from __future__ import annotations

import hashlib
import json
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from batch_data_pipeline_exercise_spark.plans.corpus_pipeline import CorpusPipeline  # noqa: E402
from batch_data_pipeline_exercise_spark.session import get_spark  # noqa: E402


def _heap_mb(spark) -> float:
    rt = spark._jvm.java.lang.Runtime.getRuntime()
    rt.gc()
    time.sleep(0.5)
    rt.gc()
    return (rt.totalMemory() - rt.freeMemory()) / 1e6


def _vec(doc_id: int) -> list[float]:
    h = hashlib.sha256(str(doc_id).encode()).digest()
    v = np.frombuffer(h[:16], dtype=np.uint8).astype(np.float64) - 127.5
    return [float(x) for x in v / np.linalg.norm(v)]


def main() -> None:
    out = Path(sys.argv[1]) if len(sys.argv) > 1 else Path("/tmp/recycle_probe.jsonl")
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf3"
    days = int(sys.argv[3]) if len(sys.argv) > 3 else 6
    per_day = int(sys.argv[4]) if len(sys.argv) > 4 else 15000

    work = Path(tempfile.mkdtemp(prefix="recycle-probe-"))
    # stage the day files ONCE with a staging session (both variants read
    # identical inputs), then stop it so each variant starts clean
    stage = get_spark(app_name="recycle-probe-stage", master="local[32]", shuffle_partitions=32)
    stage.sparkContext.setLogLevel("ERROR")
    docs = stage.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    ids = [r[0] for r in docs.select("doc_id").orderBy("doc_id").limit(days * per_day).collect()]
    from pyspark.sql import functions as F

    for d in range(days):
        ds = f"2024-02-{d + 1:02d}"
        lo, hi = ids[d * per_day], ids[min((d + 1) * per_day, len(ids)) - 1]
        day = docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") <= hi))
        day.write.mode("overwrite").parquet(str(work / f"docs_{ds}.parquet"))
        emb = [( int(r[0]), _vec(int(r[0])) ) for r in day.select("doc_id").collect()]
        stage.createDataFrame(emb, "doc_id long, embedding array<float>").write.mode(
            "overwrite"
        ).parquet(str(work / f"emb_{ds}.parquet"))
    stage.stop()

    with out.open("a") as fh:
        fh.write(json.dumps({
            "meta": "driver-JVM used heap after each corpus-pipeline day, recycle off vs on",
            "harness": "tests/recycle_probe.py", "sf_dir": sf_dir,
            "days": days, "docs_per_day": per_day,
            "heap_note": "post-double-gc totalMemory-freeMemory (retained state)",
        }) + "\n")
        for recycle_every in (0, 2):
            spark = get_spark(
                app_name="recycle-probe", master="local[32]", shuffle_partitions=32
            )
            spark.sparkContext.setLogLevel("ERROR")
            cp = CorpusPipeline(
                spark, str(work / f"wh_{recycle_every}"),
                recycle_session_every=recycle_every,
            )
            for d in range(days):
                ds = f"2024-02-{d + 1:02d}"
                t0 = time.time()
                stats = cp.run_path(
                    str(work / f"docs_{ds}.parquet"), ds, str(work / f"emb_{ds}.parquet")
                )
                rec = {
                    "recycle_every": recycle_every,
                    "ds": ds,
                    "wall_s": round(time.time() - t0, 2),
                    "heap_used_mb": round(_heap_mb(cp.spark), 1),
                    "recycles_so_far": cp.session_recycles,
                    "docs_kept": stats["docs_kept"],
                    "corpus_total": stats["corpus_total"],
                }
                fh.write(json.dumps(rec) + "\n")
                fh.flush()
                print(json.dumps(rec), flush=True)
            cp.spark.stop()


if __name__ == "__main__":
    main()
