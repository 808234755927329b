#!/usr/bin/env python
"""Round-10 task 1: demonstrate the minhash sizing knob on the flagship
(`corpus_prep_pipeline`) the way round 9 demonstrated it for the
embedding family.

The r9 sf10 profile showed the flagship at 2,732 CPU s (9.23x the sf3
296 s for 3.33x rows): the scale generator's spliced replicas form
"shares-a-half" groups whose pairwise Jaccard is ~0.33 — far below the
0.7 verify threshold, but at the shipped 4 rows/band a 0.33-Jaccard
pair band-collides with probability 8·0.33^4 ≈ 9%, so candidates grow
with the square of group size and the verify stage does
honestly-priced work on pairs it will reject. The knob the operator
docstring prescribes: more rows per band (sub-threshold collision odds
multiply by J per extra row), recall bought back with bands. The
testdata's VERIFIED pairs all have J ≥ 0.909 (measured at sf0.01 and
sf0.1), so sized sketches keep them: at J=0.909, rows=8 collides per
band with p=0.47 — 8 bands miss with (0.53)^8 = 0.6%, 16 bands with
4e-5.

For each (k, bands) config this harness, over the byte-identical
survivor set (`contract_ext.corpus_prep_survivors`):

  1. scouts the candidate join (`dedup.lsh_occupancy_stats`) — the
     pre-flight a 100 TB cluster would run before committing;
  2. runs the near-dup + cluster + canonical-select tail end-to-end
     (noop sink), recording wall + settled executor CPU / shuffle /
     input;
  3. fingerprints the VERIFIED pair set and the final output
     (order-free count + xor of row hashes) so configs can be compared
     for byte-identity across SFs.

Usage: python tests/sized_flagship.py <sf_dir> <label> [k/bands ...]
Default configs: 32/8 (operator-family default; the flagship ships the
model-derived 13/5 since round 11), 64/8, 128/16.
Writes one JSON line per config — append to evidence/SIZEDFLAG_r10.jsonl.
Data recipe for non-shipped dirs: python tests/gen_sf_scale.py /tmp/sfN
<factor> (SRC=/root/testdata/sf0.1; sf3=30, sf10=100).

NOTE: measure on a QUIET box, fresh session per sf_dir (SCALE.md
round-9 session-lifetime note); the survivor-stage cost is excluded
from the per-config counters (it runs once, before the loop).
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
from batch_data_pipeline_exercise_spark.plans.contract_ext import corpus_prep_survivors
from batch_data_pipeline_exercise_spark.session import get_spark

THRESHOLD = 0.7
DEFAULT_CONFIGS = ((32, 8), (64, 8), (128, 16))


def _fingerprint(df, cols):
    """Order-free (n, xor-of-xxhash64) over the given columns."""
    row = df.select(
        F.count(F.lit(1)).alias("n"),
        F.bit_xor(F.xxhash64(*cols)).alias("h"),
    ).first()
    return int(row["n"] or 0), int(row["h"] or 0)


def main() -> None:
    sf_dir, label = sys.argv[1], sys.argv[2]
    configs = (
        [tuple(int(x) for x in a.split("/")) for a in sys.argv[3:]]
        if len(sys.argv) > 3
        else list(DEFAULT_CONFIGS)
    )
    spark = get_spark(
        app_name="sized-flagship",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={"spark.ui.retainedStages": "100000", "spark.ui.retainedJobs": "100000"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl

    kept1 = corpus_prep_survivors(spark, sf_dir)
    n_survivors = kept1.count()

    # selective session clear: bench._clear_session_state drops EVERY
    # persistent RDD, which would delete kept1's localCheckpoint blocks
    # (lineage is truncated — the data would be gone, not recomputed).
    # Snapshot the survivor pin's RDD ids and drop only newer pins
    # between configs, same spill-attribution rationale as bench.
    jsc = spark.sparkContext._jsc
    base_ids = set(jsc.getPersistentRDDs().keySet().toArray())

    def _clear_new() -> None:
        m = jsc.getPersistentRDDs()
        for rid in list(m.keySet().toArray()):
            if rid not in base_ids:
                m.get(rid).unpersist(True)
        spark.sparkContext._jvm.System.gc()


    for k, bands in configs:
        assert k % bands == 0
        rows = k // bands

        # 1. the pre-flight scout: one signature pass + one narrow count
        t0 = time.perf_counter()
        bk = dedup.lsh_band_keys(
            dedup.minhash_signatures(
                dedup.word_shingles(kept1.select("doc_id", "text"), "doc_id", "text", 3, distinct=False),
                k,
            ),
            bands,
            rows,
        )
        stats = dedup.lsh_occupancy_stats(bk, bands).first().asDict()
        scout_wall = time.perf_counter() - t0
        _clear_new()

        # 2. the full tail, measured
        prev = bench._settled_totals(ui)
        t0 = time.perf_counter()
        ver = dedup.minhash_near_dups(
            kept1.select("doc_id", "text"), "doc_id", n=3, k=k, bands=bands, threshold=THRESHOLD
        ).localCheckpoint()
        clusters = graph.dedup_clusters(ver.select("id1", "id2"), kept1.select("doc_id"))
        out = (
            kept1.join(clusters, "doc_id")
            .filter(F.col("doc_id") == F.col("cluster"))
            .select("doc_id", "quality_score", "n_tokens")
        )
        out.write.mode("overwrite").format("noop").save()
        wall = time.perf_counter() - t0
        cur = bench._settled_totals(ui)
        delta = {m: round(cur[m] - prev[m], 3) for m in ("cpu", "shuffle_mb", "input_mb")}

        # 3. byte-identity fingerprints (cheap: ver is pinned, out re-runs
        # the final join only — excluded from the counters above on
        # purpose, the measured section is the production tail)
        pairs_n, pairs_h = _fingerprint(ver, ["id1", "id2"])
        out_n, out_h = _fingerprint(out, ["doc_id"])
        _clear_new()

        print(
            json.dumps(
                {
                    "harness": "tests/sized_flagship.py",
                    "label": label,
                    "sf_dir": sf_dir,
                    "k": k,
                    "bands": bands,
                    "rows_per_band": rows,
                    "n_survivors": n_survivors,
                    "scout": {
                        "wall": round(scout_wall, 3),
                        "candidate_pairs": stats["candidate_pairs"],
                        "max_occupancy": stats["max_occupancy"],
                        "mean_occupancy": round(stats["mean_occupancy"], 2),
                    },
                    "run": {"wall": round(wall, 3), **delta},
                    "verified_pairs": {"n": pairs_n, "xor64": pairs_h},
                    "output": {"n": out_n, "xor64": out_h},
                    "threshold": THRESHOLD,
                    "shingle_n": 3,
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
