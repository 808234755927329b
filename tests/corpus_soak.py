"""10-day corpus-pipeline soak — round-9 evidence script behind
``evidence/CORPUS_SOAK_r09.jsonl``.

The two-day test (``test_corpus_pipeline.py``) proves the O(increment)
mechanics on 5-doc days; this soak proves they HOLD under accumulation:
10 daily increments of fixed size (450 fresh sf0.1 docs + 25 injected
cross-day dups each) driven through ``CorpusPipeline.run`` with nightly
``maintain()`` compaction, recording per day

    {"ds", "docs_in", "docs_shingled", "docs_kept", "corpus_total",
     "wall_s", "cpu_s", "files": {layer: n}, "compacted": [...]}

and asserting the three soak invariants:

1. **flat per-day cost**: ``docs_shingled`` never exceeds the increment
   size on ANY day — history is never re-shingled however large the
   corpus grows (the Observation-API counter, not inspection);
2. **bounded state**: after nightly ``maintain()`` every layer's
   data-file count stays within the compaction budget
   (``max_files_per_partition × partition_dirs``), so 10 days of
   small appends cannot degenerate into thousands of files;
3. **compaction is behavior-neutral**: a from-scratch rebuild of the
   same 10 days into a fresh warehouse WITHOUT any ``maintain()`` call
   yields a byte-identical final ``corpus_docs`` (doc_id, fingerprint,
   shard, bin, ds) — the soak's compaction never changed a result.

Dup injection per day d ≥ 2 (new doc_ids ≥ 1_000_000, so they can never
collide with the sf0.1 pool): 10 exact-text copies of day-(d−1) fresh
docs (fingerprint-index probes), 8 near-copies with one word substituted
(stored-LSH cross probes), and 7 fresh texts carrying a PRIOR retained
doc's embedding vector (sign-index cross probes). Day 1 injects its dups
from its own fresh slice, so every day is the same 475-doc increment.

Embeddings: full coverage (the pipeline's contract), deterministic
16-d unit vectors hashed from doc_id — distinct doc_ids land far below
the 0.95 cosine threshold, so only the 7 injected vector-copies per day
can trip the embedding stage.

Usage: python tests/corpus_soak.py [out_jsonl] [--days N] [--recycle-every N]
       [--expected-corpus-docs N]

Defaults reproduce the r9 soak (10 days, shipped default sketch, no
recycling). The r13 variant (verdict task 7) soaks PAST day 10 with
session recycling ON at a model-SIZED config — the combination the
three r12 hardening fixes (config baked only after first persist,
pre-config-era defaults, extra_conf replay) plus the r13 conf snapshot
had never exercised end-to-end:

    python tests/corpus_soak.py evidence/CORPUS_SOAK_r13.jsonl \
        --days 15 --recycle-every 2 --expected-corpus-docs 8000

On recycle days the session (and its UI) is rebuilt at the end of
``run``, so that day's executor-CPU delta is unreadable — recorded as
``cpu_s: null`` with ``recycled: true``; the flat-cost invariant rides
``docs_shingled`` (an in-job Observation counter), not CPU.
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
from bench import _settled_totals  # noqa: E402

SRC = "/root/testdata/sf0.1/documents.parquet"
FRESH_PER_DAY = 450
N_EXACT, N_NEAR, N_VEC = 10, 8, 7
N_DAYS = 10


def _unit_vec(doc_id: int, dim: int = 16) -> list[float]:
    seed = int.from_bytes(hashlib.md5(str(doc_id).encode()).digest()[:4], "big")
    v = np.random.RandomState(seed).standard_normal(dim)
    return [float(x) for x in v / np.linalg.norm(v)]


def _build_days(spark, n_days: int = N_DAYS) -> list[tuple[str, list[tuple], list[tuple]]]:
    """[(ds, doc_rows, emb_rows)] — doc rows (doc_id, text), emb rows
    (doc_id, embedding). Deterministic; driver-side (475·days rows)."""
    # orderBy BEFORE the limit: a bare .limit() truncates in parquet
    # file/partition read order, so the soaked doc pool would depend on
    # how the source happened to be written — ordering first makes the
    # pool content-determined (the N smallest doc_ids) on any layout.
    pool = (
        spark.read.parquet(SRC)
        .select("doc_id", "text")
        .orderBy("doc_id")
        .limit(n_days * FRESH_PER_DAY)
        .collect()
    )
    days = []
    for d in range(1, n_days + 1):
        ds = f"2021-06-{d:02d}"
        fresh = pool[(d - 1) * FRESH_PER_DAY : d * FRESH_PER_DAY]
        src = pool[(max(d - 2, 0)) * FRESH_PER_DAY : (max(d - 2, 0)) * FRESH_PER_DAY + 25]
        docs = [(int(r["doc_id"]), r["text"]) for r in fresh]
        embs = [(i, _unit_vec(i)) for i, _ in docs]
        nid = 1_000_000 + d * 1000
        for i, r in enumerate(src[:N_EXACT]):  # exact-text copies
            docs.append((nid + i, r["text"]))
            embs.append((nid + i, _unit_vec(nid + i)))
        for i, r in enumerate(src[N_EXACT : N_EXACT + N_NEAR]):  # near-copies
            words = r["text"].split()
            words[len(words) // 2] = "soakednearword"
            docs.append((nid + 100 + i, " ".join(words)))
            embs.append((nid + 100 + i, _unit_vec(nid + 100 + i)))
        for i, r in enumerate(src[N_EXACT + N_NEAR : N_EXACT + N_NEAR + N_VEC]):
            # fresh-text doc carrying a PRIOR doc's vector → sign-probe dup
            vid = nid + 200 + i
            words = (r["text"] + " entirely different tail of prose for the vector dup").split()
            docs.append((vid, " ".join(reversed(words))))
            embs.append((vid, _unit_vec(int(r["doc_id"]))))
        days.append((ds, docs, embs))
    return days


def _run_sequence(
    spark, root: str, days, maintain: bool, ui_url, out: list | None, **pipeline_kwargs
) -> CorpusPipeline:
    cp = CorpusPipeline(spark, root, **pipeline_kwargs)
    for ds, docs, embs in days:
        # cp.spark, not the captured session: a recycling pipeline
        # rebinds itself to a fresh session at run boundaries and the
        # old one is dead (its UI too — re-derive the URL per day)
        ui_url = cp.spark.sparkContext.uiWebUrl
        recycles_before = cp.session_recycles
        ddf = cp.spark.createDataFrame(docs, "doc_id long, text string")
        edf = cp.spark.createDataFrame(embs, "doc_id long, embedding array<double>")
        before = _settled_totals(ui_url) if out is not None else None
        t0 = time.perf_counter()
        stats = cp.run(ddf, ds, embeddings=edf)
        wall = time.perf_counter() - t0
        recycled = cp.session_recycles > recycles_before
        compacted = cp.maintain() if maintain else []
        if out is not None:
            after = None if recycled else _settled_totals(ui_url)
            cpu = round(after["cpu"] - before["cpu"], 2) if before and after else None
            rec = {
                "recycled": recycled,
                **{k: stats[k] for k in ("ds", "docs_in", "docs_shingled", "docs_kept", "corpus_total")},
                "embedding_pairs": stats.get("embedding_pairs"),
                "wall_s": round(wall, 2),
                "cpu_s": cpu,
                "files": {t: cp.wh.file_count(t) for t in cp.MAINTAINED_TABLES if cp.wh.exists(t)},
                "compacted": compacted,
            }
            out.append(rec)
            print(json.dumps(rec), flush=True)
            inc = len(docs)
            assert stats["docs_shingled"] <= inc, (
                f"{ds}: shingled {stats['docs_shingled']} > increment {inc} — history re-shingled"
            )
            for t in cp.MAINTAINED_TABLES:
                if cp.wh.exists(t):
                    budget = 8 * cp.wh.partition_dir_count(t)
                    n = cp.wh.file_count(t)
                    assert n <= budget, f"{ds}: {t} has {n} files > budget {budget}"
    return cp


def main() -> None:
    args = [a for a in sys.argv[1:]]

    def _opt(name: str) -> int | None:
        if name in args:
            i = args.index(name)
            v = int(args[i + 1])
            del args[i : i + 2]
            return v
        return None

    n_days = _opt("--days") or N_DAYS
    recycle_every = _opt("--recycle-every") or 0
    expected_docs = _opt("--expected-corpus-docs")
    if "--source" in args:
        # a >10-day soak needs a pool bigger than sf0.1's 5,000 docs
        # (the r13 first attempt starved days 12-15 to 58/14/0/0
        # fresh docs) — point at a scaled corpus, e.g. /tmp/sf10
        global SRC
        i = args.index("--source")
        SRC = args[i + 1]
        del args[i : i + 2]
    out_path = Path(args[0]) if args else REPO / "evidence" / "CORPUS_SOAK_r09.jsonl"
    pipeline_kwargs: dict = {"recycle_session_every": recycle_every}
    if expected_docs is not None:
        pipeline_kwargs["expected_corpus_docs"] = expected_docs

    spark = get_spark(
        app_name="corpus-soak",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={"spark.ui.retainedStages": "100000", "spark.ui.retainedJobs": "100000"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui_url = spark.sparkContext.uiWebUrl
    days = _build_days(spark, n_days)

    records: list[dict] = []
    with tempfile.TemporaryDirectory() as tmp:
        cp = _run_sequence(
            spark, f"{tmp}/soak", days, maintain=True, ui_url=ui_url, out=records,
            **pipeline_kwargs,
        )
        final = sorted(
            (r["doc_id"], r["fingerprint_norm"], r["shard"], r["bin"], r["ds"])
            for r in cp.wh.read(cp.DOCS).select("doc_id", "fingerprint_norm", "shard", "bin", "ds").collect()
        )
        # from-scratch rebuild, never compacted, never recycled, SAME
        # sketch config → identical final corpus (compaction AND
        # recycling are both behavior-neutral)
        rebuild_kwargs = {
            k: v for k, v in pipeline_kwargs.items() if k != "recycle_session_every"
        }
        cp2 = _run_sequence(
            cp.spark, f"{tmp}/rebuild", days, maintain=False, ui_url=ui_url, out=None,
            **rebuild_kwargs,
        )
        rebuilt = sorted(
            (r["doc_id"], r["fingerprint_norm"], r["shard"], r["bin"], r["ds"])
            for r in cp2.wh.read(cp2.DOCS).select("doc_id", "fingerprint_norm", "shard", "bin", "ds").collect()
        )
        assert final == rebuilt, "soak (with compaction+recycling) != from-scratch rebuild"

    summary = {
        "soak": f"corpus_pipeline_{n_days}day",
        "days": len(records),
        "increment": FRESH_PER_DAY + N_EXACT + N_NEAR + N_VEC,
        "sketch_config": {
            "text_k": cp.text_k, "text_bands": cp.text_bands,
            "emb_bands": cp.emb_bands, "emb_rows": cp.emb_rows,
            "sized": expected_docs is not None,
        },
        "recycle_every": recycle_every,
        "session_recycles": cp.session_recycles,
        "final_corpus_total": records[-1]["corpus_total"],
        "max_docs_shingled": max(r["docs_shingled"] for r in records),
        "rebuild_equal": True,
        "cpu_day2": records[1]["cpu_s"],
        "cpu_final": records[-1]["cpu_s"],
    }
    print(json.dumps(summary), flush=True)
    out_path.parent.mkdir(exist_ok=True)
    with out_path.open("w") as f:
        for r in records + [summary]:
            f.write(json.dumps(r) + "\n")
    # `spark` may be dead if the soak pipeline recycled; cp2 never does
    cp2.spark.stop()


if __name__ == "__main__":
    main()
