"""Staged, disk-bounded DuckDB oracle runs for the MINHASH-FAMILY
registry queries at scale factors where the monolithic oracles exceed
local temp space.

Same diagnosis as `tests/oracle_staged_flagship.py` (which see): the
family's oracles all open with the identical `toks -> sh -> words ->
sig -> bands -> cand` CTE chain over the full `documents` corpus, and
DuckDB plans each 3 KB statement as ONE pipeline whose intermediates
are live simultaneously and spill raw. At sf3 the r10 sweep measured
`dedup_aware_split` and `doc_dup_clusters` dying on ENOSPC after tens
of GB of spill — while their Spark sides finished in 70-98 s.

This runner:
  1. stages the shared prefix tables ONCE as ZSTD parquet
     (`sh`, `sig`, `cand` — exactly the fragment SQL from
     `plans/contract_ext`, executed stage-by-stage), and
  2. for each family query REWRITES its registered oracle by stripping
     the shared CTE fragments (exact-text removal of the same module
     constants the oracle was composed from), so the tail SQL — the
     part that differs per query — runs verbatim against the staged
     views. Nothing is re-implemented; the oracle is re-SCHEDULED.
  3. compares against the Spark side with run_sweep's strictness
     (row counts equal + symmetric EXCEPT ALL empty) and appends a
     `mode: staged-oracle` match record per query.

Usage:
  python tests/oracle_staged_minhash.py [sf_dir] [workdir] [out.jsonl] [q1,q2,...]
Defaults: /tmp/sf3, /tmp/mhoracle, evidence/STAGEDORACLE_sf3_r10.jsonl,
all family queries.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import duckdb  # noqa: E402

from batch_data_pipeline_exercise_spark.plans import contract  # noqa: E402
from batch_data_pipeline_exercise_spark.plans import (  # noqa: F401,E402
    contract2,
    contract3,
    contract4,
    contract5,
    contract6,
)
from batch_data_pipeline_exercise_spark.plans import contract_ext as ce  # noqa: E402
from batch_data_pipeline_exercise_spark.session import get_spark  # noqa: E402
from tests.sweep_routing import fresh_workdir  # noqa: E402

# every query whose oracle opens with (a prefix of) the shared chain
FAMILY = [
    "doc_minhash_lsh_pairs",
    "doc_incremental_lsh_pairs",
    "dup_graph_degree_histogram",
    "doc_near_dup_verified",
    "doc_dup_clusters",
    "dedup_aware_split",
    "doc_containment_pairs",
    "doc_ngram_jaccard_pairs",
]

# the 5-gram dup-graph pair: same pathology, different inline prefix
# (toks -> 5-gram sh -> UNCAPPED df self-join into edges e). The edge
# aggregation is re-scheduled as a shingle-hash-partitioned partial
# count + SUM (exactly Spark's map-side-combine shuffle shape): ni is
# additive across disjoint shingle partitions, and HAVING >= 5 applies
# to the summed count, so the result set is identical to the monolithic
# `GROUP BY 1,2 HAVING COUNT(*) >= 5` — which at sf3 spilled 44 GB raw
# and died on ENOSPC inside one DuckDB pipeline.
FAMILY5 = ["dup_graph_pagerank2", "dup_graph_triangles"]
# shingle-hash partition count for the staged edge build; 8 suffices at
# sf3 (1.1e8 join pairs), sf10's 1.28e9 (measured r14) wants more and
# smaller partial-count spills — MH_E_CHUNKS overrides
E_CHUNKS = int(os.environ.get("MH_E_CHUNKS", "8"))

# -------- triangle aggregate compare (r14, retires the last sf10 skip)
#
# sf10's 5-gram graph holds 50.6M edges and 1.97e9 triangles (measured
# r14): materializing the enumeration on BOTH engines plus a symmetric
# EXCEPT ALL would spill tens of GB each way — the real cubic blowup the
# old skip described. But the differential does not need the rows on
# disk: both engines reduce the SAME triangle stream to one row —
# exact COUNT plus two order-independent modular checksums with
# different (weights, modulus) — in bounded memory, no driver collect,
# no parquet. Every triangle contributes to the compared value (unlike
# a sampled-vertex oracle), and the arithmetic is exact 64-bit integer
# on both engines: per-row terms stay under 2^63 for any doc_id <
# 9.2e12, per-sum under rows * modulus < 2^62 for rows < 2^31. A
# single-row disagreement flips at least one checksum unless it
# collides mod BOTH near-2^31 primes simultaneously (~2^-62).
# Equivalence to the full row compare is pinned at test SF in
# tests/test_staged_oracle_tools.py. MH_TRI_AGG_MIN_SF overrides the
# routing threshold (sf >= 10 by default; sf3's 50M rows compare fully).
TRI_CHECKSUMS = (
    # (c_a, c_b, c_c, modulus) — distinct weights per vertex column so
    # a permuted triangle cannot alias the original; two independent
    # prime moduli
    (1_000_003, 10_007, 7_368_787, 2_147_483_647),
    (999_983, 20_011, 5_000_011, 2_147_483_629),
)


def tri_agg_sql(table: str) -> str:
    """The shared aggregate expression (ANSI SQL — runs verbatim on
    DuckDB and Spark): COUNT(*) plus one SUM per checksum config."""
    sums = ", ".join(
        f"SUM((doc_a * {ca} + doc_b * {cb} + doc_c * {cc}) % {m}) AS ck{i}"
        for i, (ca, cb, cc, m) in enumerate(TRI_CHECKSUMS)
    )
    return f"SELECT COUNT(*) AS n, {sums} FROM {table}"

# the exact module constants the oracles are composed from; stripping
# them (plus their list separator) leaves each query's own tail
FRAGS = [ce._TOKS_CTE, ce._SHINGLES_CTE, ce._MH_WORDS, ce._MH_SIG, ce._CAND_CTE]


def min_label_clusters(
    con: "duckdb.DuckDBPyConnection",
    emit=lambda rec: None,
    edges: str = "cand",
    universe: str = "documents",
    id_col: str = "doc_id",
) -> None:
    """Materialize `clusters_lp({id_col}, cluster)` — the SAME component
    function the reach-CTE oracles compute (cluster = MIN id reachable,
    self included) via min-label-propagation fixpoint, over a staged
    ``edges`` view (columns id1, id2) and a ``universe`` view carrying
    ``id_col`` (isolated ids cluster to themselves). Defaults are the
    minhash family's (`cand` pairs over `documents`); the embedding
    survivors runner passes (`ver`, `embeddings`, `vec_id`).

    Why not the registered recursive CTE: `reach` materializes the
    FULL transitive closure — Σ m·(m−1) rows over components — and
    the sf3 candidate graph percolates into one 88,761-node giant
    component (union-find over the staged cand.parquet), putting the
    closure at 7.9e9 rows. No scheduling fixes that; it is the same
    oracle-side degeneracy documented for embedding_dedup_survivors
    since r6. Label propagation computes the identical min-id-per-
    component in O(edges) per round for diameter rounds, exactly like
    the Spark side's iterative components (operators/graph.py) — an
    independent ENGINE (DuckDB) even if no longer an independent
    ALGORITHM family. Equivalence to the recursive-CTE oracles is
    pinned at sf0.001 in tests/test_staged_oracle_tools.py (both the
    minhash defaults and the embedding parameterization)."""
    t0 = time.time()
    con.execute(f"""
      CREATE OR REPLACE TABLE lab AS
      SELECT node_id, node_id AS label FROM (
        SELECT id1 AS node_id FROM {edges} UNION SELECT id2 FROM {edges}
      )
    """)
    con.execute(f"""
      CREATE OR REPLACE TABLE bidir_c AS
      SELECT id1 AS u, id2 AS v FROM {edges} UNION ALL SELECT id2, id1 FROM {edges}
    """)
    rounds = 0
    while True:
        rounds += 1
        con.execute("""
          CREATE OR REPLACE TABLE lab_next AS
          SELECT l.node_id,
                 LEAST(l.label, COALESCE(MIN(ln.label), l.label)) AS label
          FROM lab l
          LEFT JOIN bidir_c b ON b.u = l.node_id
          LEFT JOIN lab ln ON ln.node_id = b.v
          GROUP BY l.node_id, l.label
        """)
        changed = con.execute(
            "SELECT count(*) FROM lab l JOIN lab_next n USING (node_id) WHERE l.label <> n.label"
        ).fetchone()[0]
        con.execute("CREATE OR REPLACE TABLE lab AS SELECT * FROM lab_next")
        if changed == 0:
            break
    con.execute(f"""
      CREATE OR REPLACE TABLE clusters_lp AS
      SELECT u.{id_col}, COALESCE(l.label, u.{id_col}) AS cluster
      FROM {universe} u LEFT JOIN lab l ON l.node_id = u.{id_col}
    """)
    emit({"stage": "clusters_labelprop", "edges": edges, "rounds": rounds,
          "rows": con.execute("SELECT count(*) FROM clusters_lp").fetchone()[0],
          "t": round(time.time() - t0, 1)})


def split_case_expr(oracle: str) -> str:
    """Extract dedup_aware_split's CASE ... END AS split expression from
    the registered oracle text — the only query-specific piece the
    labelprop tail needs. Exact-text surgery like strip_shared; the
    sf0.001 equivalence test pins that the extraction stays valid."""
    return oracle[oracle.index("CASE WHEN"):oracle.index("END AS split") + len("END AS split")]


def labelprop_tail(q: str, oracle: str) -> str:
    """The per-query SELECT over the staged clusters_lp table."""
    if q == "doc_dup_clusters":
        return "SELECT doc_id, cluster FROM clusters_lp"
    return f"SELECT doc_id, cluster, {split_case_expr(oracle)} FROM clusters_lp"


def strip_shared(oracle: str) -> str:
    o = oracle
    for frag in FRAGS:
        o = o.replace(frag + ", ", "").replace(frag, "")
    # "WITH RECURSIVE , sym AS ..." / "WITH , dfreq AS ..." -> keep WITH
    o = re.sub(r"WITH(\s+RECURSIVE)?\s*,", lambda m: "WITH" + (m.group(1) or "") + " ", o, count=1)
    # "WITH  SELECT ..." (no CTEs left) -> plain SELECT
    o = re.sub(r"^\s*WITH(\s+RECURSIVE)?\s+SELECT", "SELECT", o.strip(), count=1)
    for marker in ("toks AS (", " sh AS (", "words AS (", " sig AS (", "bands AS ("):
        assert marker not in o, f"shared fragment survived the strip: {marker}"
    return o


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf3"
    work = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/mhoracle")
    out = Path(sys.argv[3] if len(sys.argv) > 3 else REPO / "evidence" / "STAGEDORACLE_sf3_r10.jsonl")
    queries = sys.argv[4].split(",") if len(sys.argv) > 4 else FAMILY + FAMILY5
    fresh_workdir(work)

    con = duckdb.connect()
    con.execute(f"PRAGMA threads={int(os.environ.get('MH_DUCK_THREADS', '24'))}")
    con.execute(f"PRAGMA memory_limit='{os.environ.get('MH_DUCK_MEM', '40GB')}'")
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
        emit({
            "stage": name, "rows": n, "mb": round(dest.stat().st_size / 1e6, 1),
            "t": round(time.time() - t0, 1),
            "disk_free_gb": round(shutil.disk_usage(work).free / 1e9, 1),
        })

    mh_queries = [q for q in queries if q in FAMILY]
    g5_queries = [q for q in queries if q in FAMILY5]

    if mh_queries:
        stage("sh", f"WITH {ce._TOKS_CTE}, {ce._SHINGLES_CTE} SELECT * FROM sh")
        stage("sig", f"WITH {ce._MH_WORDS}, {ce._MH_SIG} SELECT * FROM sig")
        stage("cand", f"WITH {ce._CAND_CTE} SELECT * FROM cand")

    if g5_queries:
        # the two oracles share a byte-identical toks+sh prefix; lift it
        # from the registered text so the staged SQL is the oracle's own
        o5 = contract.REGISTRY[g5_queries[0]].oracle
        prefix5 = o5[o5.index("toks AS"):o5.rindex(",", 0, o5.index("e AS ("))]
        stage("sh5", f"WITH {prefix5} SELECT * FROM sh")
        t0 = time.time()
        for k in range(E_CHUNKS):
            stage(f"e_part{k}", f"""
              SELECT a.doc_id AS src, b.doc_id AS dst, COUNT(*) AS c
              FROM sh5 a JOIN sh5 b
                ON a.s = b.s AND a.doc_id < b.doc_id
              WHERE hash(a.s) % {E_CHUNKS} = {k}
              GROUP BY 1, 2
            """)
        parts = ", ".join(f"'{work}/e_part{k}.parquet'" for k in range(E_CHUNKS))
        stage("e", f"""
          SELECT src, dst FROM (
            SELECT src, dst, SUM(c) AS c FROM read_parquet([{parts}]) GROUP BY 1, 2
          ) WHERE c >= 5
        """)
        emit({"stage": "e_total", "t": round(time.time() - t0, 1)})

    REACH_QUERIES = {"doc_dup_clusters", "dedup_aware_split"}
    labelprop_done = False

    from tests.sweep_routing import infer_sf
    tri_agg_min_sf = float(os.environ.get("MH_TRI_AGG_MIN_SF", "10"))
    tri_agg = infer_sf(sf_dir) >= tri_agg_min_sf

    # MH_SPARK_CONF: semicolon-separated k=v session confs for the
    # evidence run (same logical plans; physical strategy only). The
    # sf10 triangle aggregate needs the two edge joins BROADCAST —
    # edges are 50.6M rows ≈ 800 MB, far under the 8 GB broadcast cap,
    # and broadcasting turns the 3.66e9-row wedge stream into one
    # pipelined pass into the partial aggregate, no wedge shuffle (the
    # 32-thread SMJ sort of that stream is what SPILL_OOMed the r14
    # first attempt). Recorded in the evidence record.
    extra_conf = dict(
        kv.split("=", 1)
        for kv in os.environ.get("MH_SPARK_CONF", "").split(";")
        if "=" in kv
    ) or None
    # MH_DRIVER_MEMORY: runner-local heap override. The sweep shard that
    # shells out to this runner keeps its own default-sized session
    # alive, so a global SPARK_DRIVER_MEMORY bump would double-charge
    # the box; this scopes the bigger heap (broadcast edge relations
    # at sf10) to the runner process alone.
    if os.environ.get("MH_DRIVER_MEMORY"):
        os.environ["SPARK_DRIVER_MEMORY"] = os.environ["MH_DRIVER_MEMORY"]

    def _spark():
        s = get_spark(
            app_name="mh-oracle-staged", master="local[32]",
            shuffle_partitions=32, extra_conf=extra_conf,
        )
        s.sparkContext.setLogLevel("ERROR")
        return s

    spark = _spark()

    # fresh-session discipline inside the runner too: one shared session
    # across the family OOMed at sf10 once the heaviest query ran first
    # (round-11; the same JVM-state ratchet measured in
    # evidence/RECYCLE_r11.jsonl). Default: recycle every 2 queries at
    # big SF; MH_RECYCLE_EVERY overrides, 0 disables.
    recycle_every = int(os.environ.get("MH_RECYCLE_EVERY", "2"))
    since_recycle = 0

    for q in mh_queries + g5_queries:
        if recycle_every and since_recycle >= recycle_every:
            spark.stop()
            spark = _spark()
            since_recycle = 0
        since_recycle += 1
        entry = contract.REGISTRY[q]
        mode = "staged-oracle"
        if q in REACH_QUERIES and os.environ.get("MH_LABELPROP", "1") == "1":
            mode = "staged-oracle-labelprop"
            if not labelprop_done:
                min_label_clusters(con, emit)
                labelprop_done = True
            tail = labelprop_tail(q, entry.oracle)
        elif q in FAMILY5:
            o = entry.oracle
            # tail = everything after the e CTE, run against the staged
            # views; the CTE list reopens with WITH when a tail remains
            after_e = o.index("bidir AS") if "bidir AS" in o else o.index("SELECT e1.src")
            tail = ("WITH " + o[after_e:]) if "bidir AS" in o else o[after_e:]
        else:
            tail = strip_shared(entry.oracle)
        if q == "dup_graph_triangles" and tri_agg:
            # aggregate compare: both engines reduce the full triangle
            # stream to (count, checksums) — see TRI_CHECKSUMS
            rec = {"q": q, "mode": "staged-oracle-aggregate", "sf_dir": sf_dir,
                   "checksum_cfg": [list(c) for c in TRI_CHECKSUMS]}
            if extra_conf:
                rec["spark_conf"] = extra_conf
            try:
                t0 = time.time()
                tri = entry.fn(spark, sf_dir)
                tri.createOrReplaceTempView("spark_tri")
                srow = spark.sql(tri_agg_sql("spark_tri")).collect()[0]
                rec["ts"] = round(time.time() - t0, 1)
                t0 = time.time()
                after_e = entry.oracle.index("SELECT e1.src")
                con.execute(
                    f"CREATE OR REPLACE VIEW oracle_tri AS {entry.oracle[after_e:]}"
                )
                orow = con.execute(tri_agg_sql("oracle_tri")).fetchone()
                rec["td"] = round(time.time() - t0, 1)
                svals = [int(srow["n"])] + [int(srow[f"ck{i}"]) for i in range(len(TRI_CHECKSUMS))]
                ovals = [int(v) for v in orow]
                rec.update({
                    "match": svals == ovals,
                    "n": svals[0], "n_oracle": ovals[0],
                    "spark_checksums": svals[1:], "oracle_checksums": ovals[1:],
                })
            except Exception as e:  # keep going; the record carries the failure
                rec["oracle_err"] = f"{type(e).__name__}: {e}"[:400]
            emit(rec)
            continue
        rec = {"q": q, "mode": mode, "sf_dir": sf_dir}
        try:
            t0 = time.time()
            spark_dest = work / f"spark_{q}.parquet"
            entry.fn(spark, sf_dir).write.mode("overwrite").parquet(str(spark_dest))
            rec["ts"] = round(time.time() - t0, 1)
            t0 = time.time()
            oracle_dest = work / f"oracle_{q}.parquet"
            con.execute(f"COPY ({tail}) TO '{oracle_dest}' (FORMAT PARQUET, COMPRESSION ZSTD)")
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
        except Exception as e:  # keep going; the record carries the failure
            rec["oracle_err"] = f"{type(e).__name__}: {e}"[:400]
        emit(rec)

    spark.stop()


if __name__ == "__main__":
    main()
