"""run_sweep resume semantics: a restarted sweep must re-run recorded
failures (so a fix is re-verified without hand-editing the evidence
file) while still skipping passes, rows-only records, and deliberate
skips. Pure-predicate tests — no Spark session."""

from __future__ import annotations

from tests.run_sweep import resumable


def test_passes_and_skips_resume():
    assert resumable({"q": "a", "match": True, "n": 3, "t": 0.1})
    # rows-only queries record match=None
    assert resumable({"q": "b", "match": None, "n": 3, "t": 0.1})
    assert resumable({"q": "c", "skip": "pathological oracle at this SF"})


def test_failures_rerun():
    assert not resumable({"q": "a", "spark_err": "boom", "t": 0.1})
    assert not resumable({"q": "b", "oracle_err": "boom", "t": 0.1})
    assert not resumable({"q": "c", "match": False, "n": 3, "t": 0.1, "diff": []})


def test_truncated_records_rerun():
    """A killed run's partial flush (or an older record format) can leave
    a parseable line with no completion marker — it must re-run, not
    count as done."""
    assert not resumable({"q": "x"})
    assert not resumable({"q": "x", "t": 0.1})
    assert not resumable({"q": "x", "ts": 2.0})  # spark done, oracle never ran


def test_last_record_wins():
    """Replaying the file in order: fail-then-pass resumes, pass-then-fail
    re-runs — mirrors main()'s add/discard fold."""
    records = [
        {"q": "fixed", "match": False, "n": 3},
        {"q": "fixed", "match": True, "n": 3},
        {"q": "regressed", "match": True, "n": 3},
        {"q": "regressed", "spark_err": "x"},
    ]
    done: set[str] = set()
    for rec in records:
        if resumable(rec):
            done.add(rec["q"])
        else:
            done.discard(rec["q"])
    assert done == {"fixed"}


def test_documented_divergence_resumes():
    """A mismatch verified inside a documented approximation envelope is
    an accounted outcome, not a failure to re-run."""
    assert resumable({"q": "a", "match": False, "n": 5, "documented": "HLL bound"})
    assert not resumable({"q": "a", "match": False, "n": 5})


def test_sf_inference(monkeypatch):
    from tests import sweep_routing as sr

    monkeypatch.delenv("SWEEP_SF", raising=False)
    assert sr.infer_sf("/root/testdata/sf0.01") == 0.01
    assert sr.infer_sf("/tmp/sf10") == 10.0
    assert sr.infer_sf("/tmp/sf3/") == 3.0
    assert sr.infer_sf("/data/whatever") == 0.0  # unrecognizable: route nothing
    monkeypatch.setenv("SWEEP_SF", "7")
    assert sr.infer_sf("/data/whatever") == 7.0


def _fake_sf_dir(tmp_path, n_embeddings: int) -> str:
    """An sf-dir stub holding only an embeddings.parquet whose FOOTER
    says n rows — model_emb_sketch reads metadata only, so this pins the
    model pick without generating real vectors."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    tmp_path.mkdir(parents=True, exist_ok=True)
    pq.write_table(
        pa.table({"vec_id": pa.array(range(n_embeddings), type=pa.int64())}),
        tmp_path / "embeddings.parquet",
    )
    return str(tmp_path)


def test_routing_thresholds(tmp_path):
    """Staged routes and known skips engage at the measured cliffs: the
    minhash family monolithic oracles die at sf3 (ENOSPC), the quadratic
    brute-force differentials at sf10."""
    from tests import sweep_routing as sr

    assert not sr.staged_groups(0.01, sr.STAGED_ORACLES)  # test SF: monolithic
    g3 = sr.staged_groups(3.0, sr.STAGED_ORACLES)
    assert ("oracle_staged_minhash.py", "minhash") in g3
    assert ("oracle_staged_flagship.py", "flagship") in g3
    assert "doc_minhash_lsh_pairs" in g3[("oracle_staged_minhash.py", "minhash")]

    # r14 (verdict task 1): ZERO auto-skips at any SF — the ANN trio's
    # "quadratic oracle" reason was stale (the registered queries pin 10
    # query vectors; re-measured exact at sf10 with td <= 8.4 s), and
    # the graph pair routes to the staged runner at sf10 like at sf3
    assert not sr.auto_skips(10.0)
    assert not sr.KNOWN_SKIPS
    g10s = sr.staged_groups(10.0, sr.STAGED_ORACLES)
    assert "dup_graph_pagerank2" in g10s[("oracle_staged_minhash.py", "minhash")]
    assert "dup_graph_triangles" in g10s[("oracle_staged_minhash.py", "minhash")]
    # embedding family (r12 verdict task 1): at sf10 it is no longer
    # SKIPPED — it routes to a sized-sketch child sweep (the 8x8 cliff
    # was the engine's own scouted candidate volume, not oracle
    # infeasibility); below sf10 the registry default runs as before
    for q in ("embedding_near_dup_pairs", "embedding_incremental_near_dups",
              "embedding_dedup_survivors"):
        assert q not in sr.auto_skips(10.0)
    sf10ish = _fake_sf_dir(tmp_path, 200_000)  # sf10's embedding corpus size
    assert not sr.sized_sketch_groups(3.0, sr.SIZED_SKETCH, sf10ish)
    g10 = sr.sized_sketch_groups(10.0, sr.SIZED_SKETCH, sf10ish)
    # the pick is MODEL-DERIVED (r13 verdict task 3), not curated: at
    # n=200k it must reproduce the 8x12 the r13 sf10 sweep verified
    # (evidence/SWEEP_sf10_r13.jsonl — continuity pin), and a 10x corpus
    # must re-size itself upward without anyone editing a constant
    assert sorted(g10) == ["8x12"] and len(g10["8x12"]) == 3
    assert sr.model_emb_sketch(sf10ish) == "8x12"
    bigger = sr.model_emb_sketch(_fake_sf_dir(tmp_path / "b", 2_000_000))
    b_bands, b_rows = (int(x) for x in bigger.split("x"))
    assert b_rows > 12, f"10x the corpus must deepen the sketch, got {bigger}"
    # survivors: staged-labelprop route from sf1 still holds (the sized
    # child inherits it, so the recursive-CTE oracle never runs at scale)
    assert "embedding_dedup_survivors" not in sr.auto_skips(3.0)
    g1 = sr.staged_groups(1.0, sr.STAGED_ORACLES)
    assert g1.get(("oracle_staged_embedding.py", "embedding")) == [
        "embedding_dedup_survivors"
    ]
    assert ("oracle_staged_embedding.py", "embedding") in g3
    # sized pair queries compare via parquet at sf10 (17M rows measured)
    assert sr.wants_parquet_compare("embedding_near_dup_pairs", 10.0)
    assert not sr.wants_parquet_compare("embedding_near_dup_pairs", 3.0)

    assert not sr.wants_parquet_compare("lineitem_unpivot", 0.01)
    assert sr.wants_parquet_compare("lineitem_unpivot", 3.0)
    assert not sr.wants_parquet_compare("orders_by_status", 10.0)

    # every routing key is a real registry query (typo guard)
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from batch_data_pipeline_exercise_spark.plans import contract  # noqa: F401
    from batch_data_pipeline_exercise_spark.plans import (  # noqa: F401
        contract2, contract3, contract4, contract5, contract6, contract_ext,
    )
    known = set(contract.REGISTRY)
    for name in (
        set(sr.STAGED_ORACLES) | set(sr.KNOWN_SKIPS) | set(sr.SIZED_SKETCH)
        | set(sr.DOCUMENTED_DIVERGENCES) | set(sr.PARQUET_COMPARE)
    ):
        assert name in known, name


def test_within_envelope():
    from tests.sweep_routing import within_envelope

    exact = [("a", 1, 2.0), ("b", 2, 3.0)]
    assert within_envelope(exact, exact, 0.0)
    drift = [("a", 1, 2.0 * (1 + 5e-13)), ("b", 2, 3.0)]
    assert within_envelope(drift, exact, 1e-12)
    assert not within_envelope(drift, exact, 1e-14)
    # non-numeric divergence, row-count drift, and NaN all fail closed
    assert not within_envelope([("x", 1)], [("y", 1)], 1.0)
    assert not within_envelope([(1,)], [(1,), (2,)], 1.0)
    assert not within_envelope([(float("nan"),)], [(float("nan"),)], 1.0)
    assert not within_envelope([(True,)], [(2,)], 1.0)  # bools are not "numeric drift"


def test_shard_split_disjoint_complete_and_group_whole():
    """SWEEP_SHARDS splitting: shards are pairwise disjoint, cover every
    query, and keep each staged-oracle family in exactly one shard at
    routed SF (the workdir-collision lesson)."""
    from tests import sweep_routing

    names = sorted(
        set(list(sweep_routing.STAGED_ORACLES))
        | set(sweep_routing.SIZED_SKETCH)
        | {f"plain_query_{i}" for i in range(20)}
    )
    for n_shards in (2, 3):
        shards = [
            sweep_routing.shard_split(names, n_shards, i, 10.0)
            for i in range(n_shards)
        ]
        assert set().union(*shards) == set(names)
        for i in range(n_shards):
            for j in range(i + 1, n_shards):
                assert not (shards[i] & shards[j])
        by_group: dict[tuple, set[int]] = {}
        for q, route in sweep_routing.STAGED_ORACLES.items():
            if 10.0 >= route.min_sf and q not in sweep_routing.SIZED_SKETCH:
                owners = {i for i, s in enumerate(shards) if q in s}
                assert len(owners) == 1
                by_group.setdefault((route.runner, route.group), set()).update(owners)
        assert all(len(owners) == 1 for owners in by_group.values())
        # the sized-sketch family travels whole too: its child sweep owns
        # BDPE_EMB_SKETCH for the whole group in exactly one process
        sized_owners = {
            i for i, s in enumerate(shards) for q in sweep_routing.SIZED_SKETCH if q in s
        }
        assert len(sized_owners) == 1
    # at sf below every route threshold the split is plain round-robin
    lo = sweep_routing.shard_split(names, 2, 0, 0.0) | sweep_routing.shard_split(
        names, 2, 1, 0.0
    )
    assert lo == set(names)
