#!/usr/bin/env python
"""Companion to tests/sized_flagship.py: characterize WHICH verified
pairs a sized minhash sketch loses on the replica-dense scale corpora.

The sizing knob (more rows per band) trades sub-threshold candidate
volume for recall at low Jaccard: a J pair survives banding with
probability 1-(1-J^rows)^bands. The shipped test corpora's verified
pairs are all J ≥ 0.909 (byte-identical outputs at every config,
sized_flagship sf0.01/sf0.1 lines); the gen_sf_scale splice corpora
ADD a borderline-J population (spliced halves of near-dup parents land
anywhere in [0.3, 0.9]), so sized configs keep fewer verified pairs
there. This probe prints, per sized config, the Jaccard histogram of
the baseline-verified pairs the sized sketch's candidate stage misses
— the quantitative "where the stage's threshold semantics allow"
boundary for SCALE.md.

Usage: python tests/sized_recall_probe.py <sf_dir> [k/bands ...]
Default sized configs: 64/8, 128/16 (baseline is always 32/8).
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from batch_data_pipeline_exercise_spark.operators import dedup
from batch_data_pipeline_exercise_spark.plans.contract_ext import corpus_prep_survivors
from batch_data_pipeline_exercise_spark.session import get_spark

BASELINE = (32, 8)


def main() -> None:
    sf_dir = sys.argv[1]
    sized = (
        [tuple(int(x) for x in a.split("/")) for a in sys.argv[2:]]
        if len(sys.argv) > 2
        else [(64, 8), (128, 16)]
    )
    spark = get_spark(app_name="sized-recall-probe", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    kept1 = corpus_prep_survivors(spark, sf_dir).select("doc_id", "text")
    base_ver = dedup.minhash_near_dups(
        kept1, "doc_id", n=3, k=BASELINE[0], bands=BASELINE[1], threshold=0.7
    ).localCheckpoint()
    n_base = base_ver.count()

    def jhist(df):
        return {
            f"{r['b'] / 20:.2f}": r["c"]
            for r in df.groupBy(F.floor(F.col("jaccard") * 20).alias("b"))
            .agg(F.count("*").alias("c"))
            .orderBy("b")
            .collect()
        }

    # the DENOMINATOR the sizing model's validation needs: per-bin counts
    # of ALL baseline-verified pairs, so predicted lost-fraction per bin
    # (1 - lsh_recall(J_mid, sized)) can be compared to lost/baseline
    print(
        json.dumps(
            {
                "harness": "tests/sized_recall_probe.py",
                "sf_dir": sf_dir,
                "baseline": f"{BASELINE[0]}/{BASELINE[1]}",
                "baseline_verified": n_base,
                "baseline_hist_binfloor": jhist(base_ver),
            }
        ),
        flush=True,
    )

    for k, bands in sized:
        bk = dedup.lsh_band_keys(
            dedup.minhash_signatures(
                dedup.word_shingles(kept1, "doc_id", "text", 3, distinct=False), k
            ),
            bands,
            k // bands,
        )
        cand = dedup.lsh_candidate_pairs(bk).localCheckpoint()
        lost = base_ver.join(cand, ["id1", "id2"], "left_anti")
        hist = jhist(lost)
        stats = lost.agg(
            F.count("*").alias("n"), F.min("jaccard").alias("jmin"), F.max("jaccard").alias("jmax")
        ).first()
        print(
            json.dumps(
                {
                    "harness": "tests/sized_recall_probe.py",
                    "sf_dir": sf_dir,
                    "baseline": f"{BASELINE[0]}/{BASELINE[1]}",
                    "sized": f"{k}/{bands}",
                    "baseline_verified": n_base,
                    "lost_pairs": int(stats["n"]),
                    "lost_jaccard_max": stats["jmax"],
                    "lost_hist_binfloor": hist,
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
