#!/usr/bin/env python
"""Measure the recall-aware sizing knobs in the INCREMENTAL corpus
pipeline (the path the flagship e2e ladder does not cover): the same
multi-day increment stream run under (a) the operators' defaults
(8×4 minhash = k32, 8×8 sign-LSH) and (b) the config
``expected_corpus_docs`` derives for a 100k-doc corpus at the 0.9
recall floor — which sizes DOWN on both stages
(bands_rows_for(0.7, 0.9, 100k, 16k) → 6×3 = k18, predicted recall
0.920; cosine 0.95 → 2×3, predicted 0.925): small corpora don't need
the defaults' sketch width to hold the floor, and the persisted-index
bytes + per-day hash cost shrink accordingly.

Per (variant, day): wall, cumulative corpus stats, near-dup drops, and
the persisted index sizes at the end. Both variants see byte-identical
inputs. Outputs may legitimately differ (recall 0.92 vs 0.99 keeps a
few more near-dups) — the point is pricing that trade, not asserting
equality.

Usage: python tests/sized_corpus_probe.py [out_jsonl] [sf_dir] [days] [docs_per_day]
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


def _vec(doc_id: int) -> list[float]:
    h = hashlib.sha256(str(doc_id).encode()).digest()
    v = np.frombuffer(h[:16], dtype=np.uint8).astype(np.float64) - 127.5
    return [float(x) for x in v / np.linalg.norm(v)]


def main() -> None:
    out = Path(sys.argv[1]) if len(sys.argv) > 1 else Path("/tmp/sized_corpus.jsonl")
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf3"
    days = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    per_day = int(sys.argv[4]) if len(sys.argv) > 4 else 12000

    work = Path(tempfile.mkdtemp(prefix="sized-corpus-"))
    stage = get_spark(app_name="sized-corpus-stage", master="local[32]", shuffle_partitions=32)
    stage.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F

    docs = stage.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    ids = [r[0] for r in docs.select("doc_id").orderBy("doc_id").limit(days * per_day).collect()]
    ds_list = [f"2024-03-{d + 1:02d}" for d in range(days)]
    for d, ds in enumerate(ds_list):
        lo, hi = ids[d * per_day], ids[min((d + 1) * per_day, len(ids)) - 1]
        day = docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") <= hi))
        day.write.mode("overwrite").parquet(str(work / f"docs_{ds}.parquet"))
        emb = [(int(r[0]), _vec(int(r[0]))) for r in day.select("doc_id").collect()]
        stage.createDataFrame(emb, "doc_id long, embedding array<float>").write.mode(
            "overwrite"
        ).parquet(str(work / f"emb_{ds}.parquet"))
    stage.stop()

    with out.open("a") as fh:
        for label, kwargs in (
            ("defaults", {}),
            ("sized-100k", {"expected_corpus_docs": 100_000}),
        ):
            spark = get_spark(
                app_name="sized-corpus-probe", master="local[32]", shuffle_partitions=32
            )
            spark.sparkContext.setLogLevel("ERROR")
            cp = CorpusPipeline(spark, str(work / f"wh_{label}"), **kwargs)
            cfg = {
                "text_bands": cp.text_bands, "text_rows": cp.text_rows,
                "text_k": cp.text_k,
                "emb_bands": cp.emb_bands, "emb_rows": cp.emb_rows,
            }
            total_wall = 0.0
            day_rows = []
            for ds in ds_list:
                t0 = time.time()
                stats = cp.run_path(
                    str(work / f"docs_{ds}.parquet"), ds, str(work / f"emb_{ds}.parquet")
                )
                wall = time.time() - t0
                total_wall += wall
                day_rows.append({
                    "ds": ds, "wall_s": round(wall, 2),
                    "docs_kept": stats["docs_kept"],
                    "corpus_total": stats["corpus_total"],
                })
            index_bytes = {
                t: sum(f.stat().st_size for f in Path(cp.wh.path(t)).rglob("*.parquet"))
                for t in (cp.LSH_INDEX, cp.SIGN_INDEX)
                if cp.wh.exists(t)
            }
            rec = {
                "harness": "tests/sized_corpus_probe.py",
                "variant": label, "config": cfg, "sf_dir": sf_dir,
                "days": day_rows, "total_wall_s": round(total_wall, 2),
                "final_corpus_total": day_rows[-1]["corpus_total"],
                "index_bytes": index_bytes,
            }
            fh.write(json.dumps(rec) + "\n")
            fh.flush()
            print(json.dumps(rec), flush=True)
            cp.spark.stop()


if __name__ == "__main__":
    main()
