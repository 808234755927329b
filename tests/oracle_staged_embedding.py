"""Staged labelprop oracle for ``embedding_dedup_survivors`` at big SF
(round-11 verdict task 4) — the one registry query whose sf>=1 verdict
was INDIRECT until round 12 ("components verified via
embedding_near_dup_pairs"; sweep skip reason since r6).

Same diagnosis as the minhash family's ``doc_dup_clusters``: the
registered oracle is correct SQL whose recursive ``reach`` CTE
materializes the full transitive closure — Σ m·(m−1) rows over
components — which degenerates at scale on DuckDB's side only (the
Spark side iterates O(edges) rounds). This runner:

  1. stages the VERIFIED pair set ``ver`` as parquet with
     ``oracle_staged_split.split_at_cte`` — the staged SQL is the
     registered oracle's own text, byte-for-byte, executed with a
     parquet boundary (the CI-pinned tooling from round 11);
  2. computes components with the SAME min-label-propagation fixpoint
     the minhash labelprop verdicts use
     (``oracle_staged_minhash.min_label_clusters``, parameterized to
     (ver, embeddings, vec_id));
  3. runs the query's own aggregation tail over ``clusters_lp`` and
     compares against the Spark output with run_sweep strictness
     (counts equal + symmetric EXCEPT ALL empty).

The clusters_lp + tail composition is pinned equivalent to the
registered recursive-CTE oracle at sf0.001 in
tests/test_staged_oracle_tools.py.

Usage (run_sweep-compatible arg order):
  python tests/oracle_staged_embedding.py [sf_dir] [workdir] [out.jsonl]
Defaults: /tmp/sf3, /tmp/emboracle, evidence/STAGEDORACLE_local.jsonl.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import duckdb  # noqa: E402

from batch_data_pipeline_exercise_spark.plans import contract  # noqa: E402
from batch_data_pipeline_exercise_spark.plans import contract_ext  # noqa: F401,E402
from batch_data_pipeline_exercise_spark.session import get_spark  # noqa: E402
from tests.oracle_staged_minhash import min_label_clusters  # noqa: E402
from tests.oracle_staged_split import split_at_cte  # noqa: E402
from tests.sweep_routing import fresh_workdir  # noqa: E402

QUERY = "embedding_dedup_survivors"

#: the query's own final SELECT, re-expressed over the staged component
#: table — the per-query text ``labelprop_tail`` supplies for the
#: minhash family; pinned against the registered oracle at sf0.001
SURVIVORS_TAIL = (
    "SELECT cluster AS vec_id, CAST(COUNT(*) AS BIGINT) AS n_members "
    "FROM clusters_lp GROUP BY cluster"
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf3"
    work = fresh_workdir(sys.argv[2] if len(sys.argv) > 2 else "/tmp/emboracle")
    out = Path(sys.argv[3] if len(sys.argv) > 3 else REPO / "evidence" / "STAGEDORACLE_local.jsonl")

    con = duckdb.connect()
    con.execute(f"PRAGMA threads={int(os.environ.get('EMB_DUCK_THREADS', '24'))}")
    con.execute(f"PRAGMA memory_limit='{os.environ.get('EMB_DUCK_MEM', '40GB')}'")
    con.execute(f"PRAGMA temp_directory='{work}/tmp'")
    p = os.path.join(sf_dir, "embeddings.parquet")
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM '{src}'")

    fh = out.open("a")

    def emit(rec: dict) -> None:
        print(json.dumps(rec), flush=True)
        fh.write(json.dumps(rec) + "\n")
        fh.flush()

    entry = contract.REGISTRY[QUERY]
    rec: dict = {"q": QUERY, "mode": "staged-oracle-labelprop", "sf_dir": sf_dir}
    if os.environ.get("BDPE_EMB_SKETCH"):
        # sized-sketch sweep: the registry constants (and so this
        # runner's staged oracle text AND the Spark fn) were re-derived
        # from the env — record which sketch this verdict is for
        rec["emb_sketch"] = os.environ["BDPE_EMB_SKETCH"]
    try:
        # stage 1: the oracle's own text up to and including `ver`
        ver_sql, _tail = split_at_cte(entry.oracle, "ver")
        t0 = time.time()
        dest = work / "ver.parquet"
        con.execute(f"COPY ({ver_sql}) TO '{dest}' (FORMAT PARQUET, COMPRESSION ZSTD)")
        con.execute(f"CREATE OR REPLACE VIEW ver AS SELECT * FROM '{dest}'")
        emit({
            "stage": "ver",
            "rows": con.execute("SELECT count(*) FROM ver").fetchone()[0],
            "mb": round(dest.stat().st_size / 1e6, 1),
            "t": round(time.time() - t0, 1),
        })

        # stage 2: min-label-propagation components over the staged pairs
        min_label_clusters(con, emit, edges="ver", universe="embeddings", id_col="vec_id")

        # spark side
        spark = get_spark(
            app_name="emb-oracle-staged", master="local[32]", shuffle_partitions=32
        )
        spark.sparkContext.setLogLevel("ERROR")
        t0 = time.time()
        spark_dest = work / f"spark_{QUERY}.parquet"
        entry.fn(spark, sf_dir).write.mode("overwrite").parquet(str(spark_dest))
        rec["ts"] = round(time.time() - t0, 1)
        spark.stop()

        # stage 3: the query's own tail over clusters_lp, then the
        # sweep-strictness compare
        t0 = time.time()
        oracle_dest = work / f"oracle_{QUERY}.parquet"
        con.execute(f"COPY ({SURVIVORS_TAIL}) TO '{oracle_dest}' (FORMAT PARQUET, COMPRESSION ZSTD)")
        rec["td"] = round(time.time() - t0, 1)
        con.execute(f"CREATE OR REPLACE VIEW oracle_out AS SELECT * FROM '{oracle_dest}'")
        cols = ", ".join(sorted(
            r[0] for r in con.execute(
                "SELECT column_name FROM information_schema.columns WHERE table_name='oracle_out'"
            ).fetchall()
        ))
        s, o = f"'{spark_dest}/*.parquet'", "oracle_out"
        n_s = con.execute(f"SELECT count(*) FROM {s}").fetchone()[0]
        n_o = con.execute(f"SELECT count(*) FROM {o}").fetchone()[0]
        d1 = con.execute(
            f"SELECT count(*) FROM (SELECT {cols} FROM {s} EXCEPT ALL SELECT {cols} FROM {o})"
        ).fetchone()[0]
        d2 = con.execute(
            f"SELECT count(*) FROM (SELECT {cols} FROM {o} EXCEPT ALL SELECT {cols} FROM {s})"
        ).fetchone()[0]
        rec.update({
            "match": n_s == n_o and d1 == 0 and d2 == 0,
            "n": n_s, "n_oracle": n_o, "only_spark": d1, "only_oracle": d2,
        })
    except Exception as e:  # the record carries the failure
        rec["oracle_err"] = f"{type(e).__name__}: {e}"[:400]
    emit(rec)


if __name__ == "__main__":
    main()
