"""Drift protection for the staged-oracle evidence tooling.

The staged runners (`oracle_staged_flagship/minhash/split.py`) re-schedule
registered oracle SQL across parquet stage boundaries by exact-text
surgery on the module fragments. These tests pin the two invariants that
surgery depends on — (a) the splitter/stripper produce runnable SQL whose
results equal the monolithic statement, and (b) the chunked edge
aggregation is count-preserving — on sf0.001 DuckDB alone (no Spark
session), so an oracle-text edit that would silently break the big-SF
evidence path fails CI instead.
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pytest

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from batch_data_pipeline_exercise_spark.plans import contract  # noqa: E402
from batch_data_pipeline_exercise_spark.plans import (  # noqa: F401,E402
    contract2,
    contract3,
    contract4,
    contract5,
    contract6,
    contract_ext,
)
from tests.oracle_staged_minhash import FAMILY, FAMILY5, strip_shared  # noqa: E402
from tests.oracle_staged_split import split_at_cte  # noqa: E402

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("documents", "events"):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


def _rows(con, sql):
    return sorted(map(tuple, con.execute(sql).fetchall()))


def test_split_at_cte_equals_monolithic(con):
    oracle = contract.REGISTRY["session_bounce_stats"].oracle
    stage_sql, tail = split_at_cte(oracle, "sessions")
    con.execute(f"CREATE OR REPLACE TABLE sessions AS {stage_sql}")
    assert _rows(con, tail) == _rows(con, oracle)
    con.execute("DROP TABLE sessions")


def test_split_at_cte_halves_are_substrings():
    oracle = contract.REGISTRY["session_bounce_stats"].oracle
    stage_sql, tail = split_at_cte(oracle, "sessions")
    # the CTE body and the final select are the oracle's own text
    assert stage_sql.lstrip().startswith("WITH")
    assert tail.lstrip().startswith("SELECT entry_type")
    assert tail.strip() in oracle


def test_split_at_cte_is_word_boundary_anchored():
    oracle = ("WITH user_sessions AS (SELECT 1 AS x), "
              "sessions AS (SELECT x FROM user_sessions) "
              "SELECT * FROM sessions")
    stage_sql, tail = split_at_cte(oracle, "sessions")
    # must anchor on the bare `sessions` CTE, not inside `user_sessions`
    assert stage_sql.startswith("WITH user_sessions AS (SELECT 1 AS x)")
    assert stage_sql.endswith("SELECT x FROM user_sessions")
    assert tail.strip() == "SELECT * FROM sessions"
    with pytest.raises(ValueError):
        split_at_cte(oracle, "nope")


def test_strip_shared_covers_every_family_oracle(con):
    # staged views the stripped tails expect
    con.execute(f"CREATE OR REPLACE TABLE sh AS WITH {contract_ext._TOKS_CTE}, "
                f"{contract_ext._SHINGLES_CTE} SELECT * FROM sh")
    con.execute(f"CREATE OR REPLACE TABLE sig AS WITH {contract_ext._MH_WORDS}, "
                f"{contract_ext._MH_SIG} SELECT * FROM sig")
    con.execute(f"CREATE OR REPLACE TABLE cand AS WITH {contract_ext._CAND_CTE} "
                "SELECT * FROM cand")
    for q in FAMILY:
        oracle = contract.REGISTRY[q].oracle
        tail = strip_shared(oracle)  # raises if a fragment survives
        if q in ("doc_dup_clusters", "dedup_aware_split"):
            continue  # recursive closure fine at sf0.001 but covered below
        assert _rows(con, tail) == _rows(con, oracle), q
    # reach queries: staged tail vs monolithic on the tiny corpus
    for q in ("doc_dup_clusters", "dedup_aware_split"):
        oracle = contract.REGISTRY[q].oracle
        assert _rows(con, strip_shared(oracle)) == _rows(con, oracle), q


def test_chunked_edge_aggregation_is_count_preserving(con):
    o5 = contract.REGISTRY[FAMILY5[0]].oracle
    prefix5 = o5[o5.index("toks AS"):o5.rindex(",", 0, o5.index("e AS ("))]
    con.execute(f"CREATE OR REPLACE TABLE sh5 AS WITH {prefix5} SELECT * FROM sh")
    mono = _rows(con, """
      SELECT a.doc_id AS src, b.doc_id AS dst
      FROM sh5 a JOIN sh5 b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2 HAVING COUNT(*) >= 5
    """)
    chunks = " UNION ALL ".join(
        f"""SELECT a.doc_id AS src, b.doc_id AS dst, COUNT(*) AS c
            FROM sh5 a JOIN sh5 b ON a.s = b.s AND a.doc_id < b.doc_id
            WHERE hash(a.s) % 4 = {k} GROUP BY 1, 2"""
        for k in range(4)
    )
    chunked = _rows(con, f"""
      SELECT src, dst FROM (
        SELECT src, dst, SUM(c) AS c FROM ({chunks}) GROUP BY 1, 2
      ) WHERE c >= 5
    """)
    assert chunked == mono


def test_labelprop_equals_recursive_cte_oracles(con):
    """The staged-oracle-labelprop mode (doc_dup_clusters /
    dedup_aware_split at sf >= 3) substitutes min-label propagation for
    the recursive-CTE closure and extracts the split CASE expression by
    exact-text surgery — pin both against the registered oracles at
    sf0.001 so an oracle edit cannot silently break the big-SF evidence
    path (r10 ADVICE.md)."""
    from tests.oracle_staged_minhash import labelprop_tail, min_label_clusters

    con.execute(
        f"CREATE OR REPLACE TABLE cand AS WITH {contract_ext._TOKS_CTE}, "
        f"{contract_ext._SHINGLES_CTE}, {contract_ext._MH_WORDS}, "
        f"{contract_ext._MH_SIG}, {contract_ext._CAND_CTE} SELECT * FROM cand"
    )
    min_label_clusters(con)
    for q in ("doc_dup_clusters", "dedup_aware_split"):
        oracle = contract.REGISTRY[q].oracle
        assert _rows(con, labelprop_tail(q, oracle)) == _rows(con, oracle), q


def test_split_at_cte_preserves_recursive_keyword():
    oracle = (
        "WITH RECURSIVE base AS (SELECT 1 AS x), "
        "walk AS (SELECT x FROM base UNION ALL SELECT x + 1 FROM walk WHERE x < 3) "
        "SELECT max(x) AS m FROM walk"
    )
    stage_sql, tail = split_at_cte(oracle, "base")
    assert stage_sql == "SELECT 1 AS x"
    # the tail reopens the CTE list: RECURSIVE must survive the re-emit,
    # or the recursive member fails (or misparses) in DuckDB
    assert tail.startswith("WITH RECURSIVE ")
    con = duckdb.connect()
    con.execute(f"CREATE TABLE base AS {stage_sql}")
    assert con.execute(tail).fetchall() == con.execute(oracle).fetchall()


def test_fresh_workdir_refuses_foreign_directories(tmp_path):
    """A mistyped positional arg (e.g. the sf_dir) must not be rmtree'd:
    only empty dirs or ones carrying the staged-oracle marker recycle."""
    from tests.sweep_routing import fresh_workdir

    precious = tmp_path / "sfdata"
    precious.mkdir()
    (precious / "documents.parquet").write_bytes(b"x")
    with pytest.raises(SystemExit, match="refusing to delete"):
        fresh_workdir(precious)
    assert (precious / "documents.parquet").exists()

    work = tmp_path / "scratch"
    fresh_workdir(work)  # fresh create
    (work / "stage.parquet").write_bytes(b"x")
    fresh_workdir(work)  # marker present: recycles
    assert not (work / "stage.parquet").exists()
    assert (work / "tmp").is_dir()


def test_flagship_runner_fragments_match_registered_oracle():
    """The staged flagship runner re-composes the flagship's sig/cand
    fragments as stage statements; they must be the EXACT substrings of
    the registered oracle text. Round-11 regression: the runner kept the
    operator family's 8x4 constants after the flagship moved to the
    model-derived sketch, so the staged oracle silently verified a
    different construction (caught as an sf10 mismatch, 423,538 vs
    423,100 rows)."""
    from batch_data_pipeline_exercise_spark.plans import contract, contract_ext as ce

    oracle = contract.REGISTRY["corpus_prep_pipeline"].oracle
    sig = ce._mh_sig_cte(ce._FLAGSHIP_K)
    cand = ce._cand_cte(ce._FLAGSHIP_BANDS, ce._FLAGSHIP_ROWS)
    assert sig in oracle and cand in oracle
    # and the runner's source composes those builders, not the constants
    src = (Path(__file__).parent / "oracle_staged_flagship.py").read_text()
    assert "ce._mh_sig_cte(ce._FLAGSHIP_K)" in src
    assert "ce._cand_cte(ce._FLAGSHIP_BANDS, ce._FLAGSHIP_ROWS)" in src
    assert "ce._MH_SIG" not in src and "ce._CAND_CTE" not in src


def test_embedding_labelprop_equals_recursive_cte_oracle(con):
    """The embedding survivors staged mode (oracle_staged_embedding.py,
    sf >= 1): stage `ver` with split_at_cte on the oracle's own text,
    labelprop components over (ver, embeddings, vec_id), then the
    runner's SURVIVORS_TAIL — pinned equal to the registered
    recursive-CTE oracle at sf0.001 (r11 verdict task 4, same drift
    protection the minhash labelprop path got in r11)."""
    from tests.oracle_staged_embedding import SURVIVORS_TAIL

    from tests.oracle_staged_minhash import min_label_clusters

    con.execute(f"CREATE OR REPLACE VIEW embeddings AS SELECT * FROM '{SF}/embeddings.parquet'")
    oracle = contract.REGISTRY["embedding_dedup_survivors"].oracle
    ver_sql, _ = split_at_cte(oracle, "ver")
    con.execute(f"CREATE OR REPLACE TABLE ver AS {ver_sql}")
    min_label_clusters(con, edges="ver", universe="embeddings", id_col="vec_id")
    assert _rows(con, SURVIVORS_TAIL) == _rows(con, oracle)


def test_triangle_aggregate_compare_equals_row_compare(con, spark):
    """r14 (verdict task 1): at sf10 the triangle differential compares
    (COUNT, two modular checksums) instead of materializing 1.97e9 rows
    per engine. Pin on sf0.001 with BOTH engines: (a) Spark's aggregate
    of its own triangle output equals DuckDB's aggregate of the
    registered oracle — the exact comparison the runner performs; (b)
    the checksum detects single-row tampering (drop one triangle,
    perturb one vertex) — the property that makes aggregate equality
    evidence of row equality."""
    from tests.oracle_staged_minhash import TRI_CHECKSUMS, tri_agg_sql

    entry = contract.REGISTRY["dup_graph_triangles"]
    # oracle side: full registered SQL, aggregated
    con.execute(f"CREATE OR REPLACE VIEW oracle_tri AS {entry.oracle}")
    ovals = [int(v) for v in con.execute(tri_agg_sql("oracle_tri")).fetchone()]
    assert ovals[0] > 0, "test corpus has no triangles — pin is vacuous"
    # spark side: the registry fn, aggregated with the SAME SQL text
    entry.fn(spark, SF).createOrReplaceTempView("spark_tri")
    srow = spark.sql(tri_agg_sql("spark_tri")).collect()[0]
    svals = [int(srow["n"])] + [int(srow[f"ck{i}"]) for i in range(len(TRI_CHECKSUMS))]
    assert svals == ovals
    # tamper sensitivity: dropping any single triangle, or shifting one
    # vertex id by one, must flip at least one compared value
    rows = con.execute("SELECT doc_a, doc_b, doc_c FROM oracle_tri").fetchall()
    con.execute(
        "CREATE OR REPLACE VIEW tampered_drop AS "
        "SELECT * FROM oracle_tri LIMIT (SELECT COUNT(*) - 1 FROM oracle_tri)"
    )
    assert [int(v) for v in con.execute(tri_agg_sql("tampered_drop")).fetchone()] != ovals
    a, b, c = rows[0]
    con.execute(
        f"CREATE OR REPLACE VIEW tampered_shift AS "
        f"SELECT CASE WHEN doc_a = {a} AND doc_b = {b} AND doc_c = {c} "
        f"THEN doc_a + 1 ELSE doc_a END AS doc_a, doc_b, doc_c FROM oracle_tri"
    )
    tvals = [int(v) for v in con.execute(tri_agg_sql("tampered_shift")).fetchone()]
    assert tvals[0] == ovals[0] and tvals[1:] != ovals[1:]
