"""100x differential for the quantized-kmeans ANN query (round 12).

``ann_cosine_topk_ivf_kmeans`` gained a full DuckDB value-hash oracle in
round 12 (bit-reproducible integer-sum centroids). Unlike the other ANN
oracles — whose brute-force verify is quadratic and therefore skipped at
sf10 — this oracle is LINEAR on both engines (n x 16 assignment crosses,
probe-4-of-16 candidate scan), so the 100x point is actually checkable.
The query reads ONLY the embeddings table, so this probe generates just
sf10-scale embeddings — with ``gen_sf_scale.mixture_embeddings_table``,
the exact builder the full generator uses, so the data is byte-identical
to a full /tmp/sf10 run — and appends a sweep-strictness match record.

Usage:
  python tests/kmeans_scale_probe.py [emb_dir] [out.jsonl] [factor]
Defaults: /tmp/sf10emb, evidence/KMEANS_sf10_r12.jsonl, 100.
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
import pyarrow.parquet as pq  # noqa: E402

from batch_data_pipeline_exercise_spark.plans import contract  # noqa: E402
from batch_data_pipeline_exercise_spark.plans import contract_ext  # noqa: F401,E402
from batch_data_pipeline_exercise_spark.session import get_spark  # noqa: E402
from tests.gen_sf_scale import SRC, mixture_embeddings_table  # noqa: E402

QUERY = "ann_cosine_topk_ivf_kmeans"


def ensure_embeddings(emb_dir: Path, factor: int) -> Path:
    dest = emb_dir / "embeddings.parquet"
    base_tbl = pq.read_table(os.path.join(SRC, "embeddings.parquet")).sort_by("vec_id")
    expected = base_tbl.num_rows * factor
    if dest.exists():
        # provenance guard: a dir left by a run at a DIFFERENT factor
        # must not be silently reused — the evidence record would label
        # the wrong scale
        have = pq.read_table(str(dest / "part-00000.parquet"), columns=["vec_id"]).num_rows
        if have != expected:
            raise SystemExit(
                f"{dest} holds {have} rows but factor {factor} implies {expected}; "
                "delete the dir or pass the factor it was generated at"
            )
        return dest
    rows = list(zip(
        base_tbl["vec_id"].to_pylist(),
        base_tbl["embedding"].to_pylist(),
        base_tbl["label"].to_pylist(),
    ))
    key_rng = max(r[0] for r in rows) + 1
    tbl = mixture_embeddings_table(rows, factor, key_rng)
    dest.mkdir(parents=True)
    pq.write_table(tbl, str(dest / "part-00000.parquet"))
    return dest


def main() -> None:
    emb_dir = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10emb")
    out = Path(sys.argv[2] if len(sys.argv) > 2 else REPO / "evidence" / "KMEANS_sf10_r12.jsonl")
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 100

    fh = out.open("a")

    def emit(rec: dict) -> None:
        print(json.dumps(rec), flush=True)
        fh.write(json.dumps(rec) + "\n")
        fh.flush()

    t0 = time.time()
    src = ensure_embeddings(emb_dir, factor)
    n = pq.read_table(str(src / "part-00000.parquet"), columns=["vec_id"]).num_rows
    emit({"stage": "embeddings", "factor": factor, "rows": n,
          "t": round(time.time() - t0, 1)})

    entry = contract.REGISTRY[QUERY]
    rec: dict = {"q": QUERY, "mode": "spot-differential", "sf_dir": str(emb_dir),
                 "note": f"embeddings-only dir at {factor}x of sf0.1 "
                         "(the query reads no other table)"}
    try:
        con = duckdb.connect()
        con.execute(f"PRAGMA threads={int(os.environ.get('KM_DUCK_THREADS', '24'))}")
        con.execute(f"PRAGMA memory_limit='{os.environ.get('KM_DUCK_MEM', '40GB')}'")
        con.execute(f"PRAGMA temp_directory='{emb_dir}/ducktmp'")
        con.execute(f"CREATE VIEW embeddings AS SELECT * FROM '{src}/*.parquet'")
        t0 = time.time()
        oracle_dest = emb_dir / "oracle_out.parquet"
        con.execute(
            f"COPY ({entry.oracle}) TO '{oracle_dest}' (FORMAT PARQUET, COMPRESSION ZSTD)"
        )
        rec["td"] = round(time.time() - t0, 1)

        spark = get_spark(app_name="kmeans-scale-probe", master="local[32]",
                          shuffle_partitions=32)
        spark.sparkContext.setLogLevel("ERROR")
        t0 = time.time()
        spark_dest = emb_dir / "spark_out.parquet"
        entry.fn(spark, str(emb_dir)).write.mode("overwrite").parquet(str(spark_dest))
        rec["ts"] = round(time.time() - t0, 1)
        spark.stop()

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
    except Exception as e:
        rec["oracle_err"] = f"{type(e).__name__}: {e}"[:400]
    emit(rec)


if __name__ == "__main__":
    main()
