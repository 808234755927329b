"""Staged, disk-bounded DuckDB oracle run for the flagship
(`corpus_prep_pipeline`) at scale factors where the MONOLITHIC registry
oracle exceeds local temp space.

Why this exists: the registry oracle is one 12-CTE statement, and DuckDB
plans it as a single pipeline — every intermediate (the 28M-row shingle
set, the per-(doc,shingle) md5 words, the band self-join) is live in the
same memory budget at once, and past `memory_limit` they all spill RAW
to the same temp volume. At sf3 (30x) the r10 full-registry sweep
measured that spill exceeding 80 GB and dying on ENOSPC — while the
Spark side of the very same query finished in 28 s, because Spark runs
the pipeline as STAGES with narrow, compressed shuffle files between
them. This script gives the oracle the same courtesy: each CTE group is
executed on its own, its output written to ZSTD parquet, and the next
stage reads the file — peak footprint becomes max-over-stages instead
of sum-over-stages, and intermediates are columnar-compressed instead
of raw spill. The SQL text per stage is composed from the SAME module
fragments (`contract_ext._SHINGLES_CTE` etc.) the registered oracle
uses, so this is the identical computation re-scheduled, not a second
implementation.

The final comparison mirrors `tests/run_sweep.py`'s strictness: row
counts equal AND symmetric EXCEPT ALL empty over all columns (exact
value equality, floats included).

Usage:  python tests/oracle_staged_flagship.py [sf_dir] [workdir] [out.jsonl]
Defaults: /tmp/sf3, /tmp/flagoracle, evidence/FLAGORACLE_sf3_r10.jsonl
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import duckdb  # noqa: E402

from batch_data_pipeline_exercise_spark.plans import contract  # noqa: E402
from batch_data_pipeline_exercise_spark.plans import contract_ext as ce  # noqa: E402
from batch_data_pipeline_exercise_spark.session import get_spark  # noqa: E402
from tests.sweep_routing import fresh_workdir  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf3"
    work = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/flagoracle")
    out = Path(sys.argv[3] if len(sys.argv) > 3 else REPO / "evidence" / "FLAGORACLE_sf3_r10.jsonl")
    fresh_workdir(work)

    con = duckdb.connect()
    con.execute("PRAGMA threads=24")
    # modest cap: the point is bounded per-stage spill, not RAM heroics
    con.execute(f"PRAGMA memory_limit='{os.environ.get('FLAG_DUCK_MEM', '40GB')}'")
    con.execute(f"PRAGMA temp_directory='{work}/tmp'")
    p = os.path.join(sf_dir, "documents.parquet")
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{src}'")

    fh = out.open("a")

    def emit(rec: dict) -> None:
        print(json.dumps(rec), flush=True)
        fh.write(json.dumps(rec) + "\n")
        fh.flush()

    def stage(name: str, sql: str) -> None:
        t0 = time.time()
        dest = work / f"{name}.parquet"
        con.execute(f"COPY ({sql}) TO '{dest}' (FORMAT PARQUET, COMPRESSION ZSTD)")
        con.execute(f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM '{dest}'")
        n = con.execute(f"SELECT count(*) FROM {name}").fetchone()[0]
        free_gb = shutil.disk_usage(work).free / 1e9
        emit({
            "stage": name, "rows": n, "mb": round(dest.stat().st_size / 1e6, 1),
            "t": round(time.time() - t0, 1), "disk_free_gb": round(free_gb, 1),
        })

    td0 = time.time()
    # stage boundaries = the flagship's own pipeline stages (filter /
    # exact-dedup / shingle / signature / candidates / verify / cluster)
    stage("quality", ce._quality_sql())
    stage("langs", ce._langid_oracle())
    stage("kept1", f"""
      WITH kept0 AS (
        SELECT d.doc_id, d.text
        FROM documents d
        JOIN quality q ON q.doc_id = d.doc_id
        JOIN langs l ON l.doc_id = d.doc_id
        WHERE l.lang_pred = 'en' AND q.quality_score >= 0.6
      ),
      ex AS (SELECT doc_id, text, md5({ce._NORM}) AS k FROM kept0)
      SELECT e.doc_id, e.text FROM ex e
      JOIN (SELECT k, MIN(doc_id) AS m FROM ex GROUP BY k) x
        ON x.k = e.k AND x.m = e.doc_id
    """)
    # the CTE names inside each statement shadow nothing: the stage view
    # of the same name is created only after its COPY completes
    stage("sh", f"WITH {ce._toks_cte('kept1')}, {ce._SHINGLES_CTE} SELECT * FROM sh")
    # the FLAGSHIP's sketch fragments, not the operator family's 8x4
    # constants — the flagship ships the model-derived (bands, rows)
    # and its staged oracle must compose the identical construction
    # (test_staged_oracle_tools.py pins this against the registered text)
    stage("sig", f"WITH {ce._MH_WORDS}, {ce._mh_sig_cte(ce._FLAGSHIP_K)} SELECT * FROM sig")
    stage("cand", f"WITH {ce._cand_cte(ce._FLAGSHIP_BANDS, ce._FLAGSHIP_ROWS)} SELECT * FROM cand")
    stage("counts", "SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id")
    stage("inter", """
      SELECT c.id1, c.id2, COUNT(*) AS ni
      FROM cand c
      JOIN sh a ON a.doc_id = c.id1
      JOIN sh b ON b.doc_id = c.id2 AND b.s = a.s
      GROUP BY c.id1, c.id2
    """)
    stage("ver", """
      SELECT i.id1, i.id2
      FROM inter i
      JOIN counts c1 ON c1.doc_id = i.id1
      JOIN counts c2 ON c2.doc_id = i.id2
      WHERE i.ni / (c1.n + c2.n - i.ni) >= 0.7
    """)
    stage("clusters", """
      WITH RECURSIVE
      sym AS (SELECT id1 AS a, id2 AS b FROM ver UNION SELECT id2, id1 FROM ver),
      reach(a, b) AS (
        SELECT a, b FROM sym
        UNION
        SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a
      )
      SELECT k.doc_id, LEAST(k.doc_id, COALESCE(MIN(r.b), k.doc_id)) AS cluster
      FROM kept1 k LEFT JOIN reach r ON r.a = k.doc_id
      GROUP BY k.doc_id
    """)
    stage("oracle_out", f"""
      SELECT c.doc_id,
             q.quality_score,
             CAST(len(regexp_extract_all(k.text, {ce._TOKEN_SQL})) AS BIGINT) AS n_tokens
      FROM clusters c
      JOIN kept1 k ON k.doc_id = c.doc_id
      JOIN quality q ON q.doc_id = c.doc_id
      WHERE c.doc_id = c.cluster
    """)
    td = time.time() - td0

    spark = get_spark(app_name="flag-oracle-staged", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    df = contract.REGISTRY["corpus_prep_pipeline"].fn(spark, sf_dir)
    spark_dest = work / "spark_out.parquet"
    df.write.mode("overwrite").parquet(str(spark_dest))
    ts = time.time() - t0
    spark.stop()

    con.execute(f"CREATE VIEW spark_out AS SELECT * FROM '{spark_dest}/*.parquet'")
    cols = ", ".join(sorted(
        r[0] for r in con.execute(
            "SELECT column_name FROM information_schema.columns WHERE table_name='oracle_out'"
        ).fetchall()
    ))
    n_spark = con.execute("SELECT count(*) FROM spark_out").fetchone()[0]
    n_oracle = con.execute("SELECT count(*) FROM oracle_out").fetchone()[0]
    d1 = con.execute(
        f"SELECT count(*) FROM (SELECT {cols} FROM spark_out EXCEPT ALL SELECT {cols} FROM oracle_out)"
    ).fetchone()[0]
    d2 = con.execute(
        f"SELECT count(*) FROM (SELECT {cols} FROM oracle_out EXCEPT ALL SELECT {cols} FROM spark_out)"
    ).fetchone()[0]
    emit({
        "q": "corpus_prep_pipeline", "mode": "staged-oracle", "sf_dir": sf_dir,
        "match": n_spark == n_oracle and d1 == 0 and d2 == 0,
        "n": n_spark, "n_oracle": n_oracle, "only_spark": d1, "only_oracle": d2,
        "ts": round(ts, 1), "td": round(td, 1),
    })


if __name__ == "__main__":
    main()
