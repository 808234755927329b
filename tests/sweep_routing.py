"""Routing table for the full-registry differential sweep.

Round 10 proved every heavy query exact at big SF, but only via
hand-launched staged runners whose verdicts were manually merged into
the canonical sweep file — a curation step a future round could get
wrong (r10 verdict, "What's wrong" #1). This module makes the routing
data, so `tests/run_sweep.py` consults it and ONE command produces the
fully-accounted evidence file:

- ``STAGED_ORACLES``: queries whose registered oracle is correct SQL
  that DuckDB's monolithic plan cannot execute at sf >= min_sf
  (sum-over-stages raw spill -> ENOSPC; measured at sf3 in r10). The
  sweep shells out to the staged runner — the SAME oracle text executed
  with parquet stage boundaries — which appends ``mode:
  "staged-oracle"`` records to the same evidence file.
- ``KNOWN_SKIPS``: (SF, query) combinations where the DIFFERENTIAL
  itself is infeasible at scale — EMPTY since r14 (verdict task 1):
  the ANN trio's quadratic-oracle reason was stale (the registered
  queries pin 10 query vectors; re-measured exact at sf10), and the
  graph pair routes to the staged runner at every big SF, with the
  sf10 triangle enumeration compared via exact count+checksum
  aggregates instead of materialized rows. The mechanism stays for
  future genuinely-infeasible combinations; SWEEP_SKIP still overrides.
- ``SIZED_SKETCH``: queries whose registry-pinned test-scale sketch is
  the engine's own measured candidate cliff at big SF (r12 verdict
  task 1). The sweep re-invokes itself in a child process with
  ``BDPE_EMB_SKETCH=<bands>x<rows>`` so BOTH the engine query and its
  oracle re-derive the model-sized sketch and the family is verified
  at scale instead of skipped; records carry ``emb_sketch``.
- ``DOCUMENTED_DIVERGENCES``: queries exact at test SF whose big-SF
  mismatch is a quantified approximation boundary (HLL estimate error
  inside the asserted lgK=17 bound; 1-ulp dot-product reduction-order
  drift). The sweep verifies the divergence stays INSIDE the documented
  envelope before annotating the record — outside it, the record stays
  a plain failure.
- ``PARQUET_COMPARE``: queries whose result set at sf >= min_sf is too
  large for the collect-and-sort comparison (sf3 measured n >= ~1M;
  lineitem_unpivot alone is 180M rows at sf10, past any sane
  ``spark.driver.maxResultSize``). These compare via parquet files and
  symmetric EXCEPT ALL in DuckDB — the staged runners' compare, equal
  strictness (exact value equality over all columns), no driver
  collect.

Routing keys off the scale factor inferred from the sweep dir name
(``.../sf10`` -> 10.0), overridable with ``SWEEP_SF``; ``SWEEP_STAGED=0``
disables all auto-routing (the pre-r11 behavior).
"""

from __future__ import annotations

import math
import os
import re
import shutil
from dataclasses import dataclass
from pathlib import Path

# ---------------------------------------------------------------- staged


@dataclass(frozen=True)
class StagedRoute:
    """One query's staged-oracle route: shell out to tests/<runner> when
    sweeping at sf >= min_sf. Queries sharing a ``group`` are handed to
    one runner invocation so the shared CTE prefix is staged once."""

    runner: str
    group: str
    min_sf: float


_MINHASH_FAMILY = [
    # shared toks -> sh -> words -> sig -> bands -> cand prefix; the
    # monolithic statements spill raw past 80 GB at sf3 (ENOSPC,
    # evidence/SWEEP_sf3_r10.jsonl) while each stage is small in parquet
    "doc_minhash_lsh_pairs",
    "doc_incremental_lsh_pairs",
    "dup_graph_degree_histogram",
    "doc_near_dup_verified",
    "doc_dup_clusters",
    "dedup_aware_split",
    "doc_containment_pairs",
    "doc_ngram_jaccard_pairs",
    # 5-gram dup-graph pair: same pathology, edge build re-scheduled as
    # shingle-hash-partitioned partial counts (44 GB raw spill at sf3)
    "dup_graph_pagerank2",
    "dup_graph_triangles",
]

STAGED_ORACLES: dict[str, StagedRoute] = {
    **{
        q: StagedRoute("oracle_staged_minhash.py", "minhash", 3.0)
        for q in _MINHASH_FAMILY
    },
    # 12-CTE flagship: >80 GB raw spill / ENOSPC at sf3 monolithic;
    # staged oracle exact at sf3 AND sf10 (FLAGORACLE_sf{3,10}_r10.jsonl)
    "corpus_prep_pipeline": StagedRoute("oracle_staged_flagship.py", "flagship", 3.0),
    # recursive-closure degeneracy at sf>=1 (giant component -> Σ m·(m−1)
    # reach rows; documented since r6, KNOWN_SKIP until r12): stage `ver`
    # with the oracle's own text, labelprop the components — a DIRECT
    # big-SF verdict for the survivors themselves (r11 verdict task 4)
    "embedding_dedup_survivors": StagedRoute("oracle_staged_embedding.py", "embedding", 1.0),
}

# ------------------------------------------------------------------ skips

# query -> (min_sf, reason). All reasons carry the measurements that
# justify them; SWEEP_SKIP env entries override these.
#
# RETIRED r14 (verdict task 1 — zero skips at sf10):
# - ann_cosine_topk / _lsh / _ivf: the "600k x 600k = 3.6e11" reason was
#   STALE — the registered queries pin 10 query vectors (vec_id < 10),
#   so the full oracles are 10 x n differentials. Re-measured at sf10:
#   all three EXACT with the registered oracle text in td = 1.6 / 0.5 /
#   8.4 s (evidence/SWEEP_sf10_r14.jsonl) — no sampling needed.
# - dup_graph_pagerank2 / _triangles: routed to the staged minhash
#   runner at sf10 too (STAGED_ORACLES min_sf now covers it); the edge
#   build prices at 1.28e9 join pairs (measured r14), which the
#   shingle-hash-chunked partial counts schedule fine.
KNOWN_SKIPS: dict[str, tuple[float, str]] = {}

# --------------------------------------------------------- sized sketches


@dataclass(frozen=True)
class SizedSketchRoute:
    """At sf >= min_sf this query runs (engine AND oracle — both derive
    from contract_ext's module constants) at a model-sized sign-LSH
    sketch instead of the registry-pinned 8x8 test-scale config: the
    sweep re-invokes itself in a child process with
    ``BDPE_EMB_SKETCH=<sketch>`` so the family is VERIFIED at scale,
    not skipped (r12 verdict task 1 — the three sf10 skips here were
    the engine's own scouted candidate cliff, not oracle
    infeasibility). The sketch VALUE is not curated (r13 verdict task
    3): ``model_emb_sketch`` derives it per sweep from the engine's own
    sizing model and the corpus size read off the parquet footer, so a
    bigger corpus re-sizes itself — the same pick
    ``similarity.bands_rows_for`` makes everywhere else."""

    min_sf: float
    note: str


_SIZED_NOTE = (
    "8x8 at sf10 is the measured 806M-candidate cliff on both engines "
    "(EMBSCALE_sf10_r09.jsonl); the sweep sketch is bands_rows_for(cos "
    "0.95, recall 0.9, n=<parquet footer row count>, occupancy 64) — at "
    "sf10's n=200k that is 8x12, the stricter of the two r12 model picks, "
    "chosen by scout: 81M candidates vs 183M at the occupancy-256 pick "
    "(6x10), with HIGHER predicted recall (0.927 vs 0.921)"
)

SIZED_SKETCH: dict[str, SizedSketchRoute] = {
    q: SizedSketchRoute(10.0, _SIZED_NOTE)
    for q in (
        "embedding_near_dup_pairs",
        "embedding_incremental_near_dups",
        "embedding_dedup_survivors",
    )
}

#: model arguments for the sized embedding sweep sketch — the recall
#: anchor is the family's near-dup cosine (0.95, the level whose pairs a
#: resize must not forfeit), occupancy 64 the scout-validated stricter
#: pick (see _SIZED_NOTE). These are model INPUTS, not a curated output:
#: the (bands x rows) itself comes from bands_rows_for at sweep time.
SIZED_EMB_COS, SIZED_EMB_RECALL, SIZED_EMB_OCC = 0.95, 0.9, 64


def model_emb_sketch(sf_dir: str) -> str:
    """The '<bands>x<rows>' the sized embedding sweeps mirror through
    ``BDPE_EMB_SKETCH`` — derived, not curated: corpus size from the
    embeddings parquet footer (metadata only, no data read), sketch from
    the engine's own ``bands_rows_for`` at the family's anchors. Pinned
    for continuity in tests/test_staged_oracle_tools.py: n=200k (sf10's
    corpus) must reproduce the r13-verified 8x12."""
    import pyarrow.parquet as pq

    from batch_data_pipeline_exercise_spark.operators import similarity

    p = Path(sf_dir) / "embeddings.parquet"
    if p.is_dir():
        n = sum(
            pq.ParquetFile(f).metadata.num_rows
            for f in sorted(p.glob("*.parquet"))
        )
    else:
        n = pq.ParquetFile(p).metadata.num_rows
    bands, rows, _recall = similarity.bands_rows_for(
        SIZED_EMB_COS,
        SIZED_EMB_RECALL,
        n_vectors=n,
        target_occupancy=SIZED_EMB_OCC,
        p=similarity.cosine_collision_p(SIZED_EMB_COS),
    )
    return f"{bands}x{rows}"


def sized_sketch_groups(sf: float, queries, sf_dir: str) -> dict[str, list[str]]:
    """Group the sized-routable subset of ``queries`` by sketch string —
    one child sweep per sketch value (one model pick per sf_dir)."""
    routable = [
        q for q in queries
        if (route := SIZED_SKETCH.get(q)) and sf >= route.min_sf
    ]
    if not routable:
        return {}
    return {model_emb_sketch(sf_dir): routable}


# ------------------------------------------------- documented divergences

# query -> (min_sf, rel_tol, reason). Applied only when a mismatch is
# observed AND every diverging cell is numeric within rel_tol — the
# envelope check runs, it is not assumed.
DOCUMENTED_DIVERGENCES: dict[str, tuple[float, float, str]] = {
    "embedding_norm_stats": (
        1.0,
        1e-12,
        "double dot-product reduction order (DuckDB SIMD pairwise vs Spark "
        "sequential fold); max rel 6.2e-16 at sf3 (NORMSTATS_sf3_r10.json)",
    ),
    "user_reach_by_type": (
        1.0,
        0.01,
        "HLL lgK=17 estimate vs DuckDB exact distinct; +0.29% at sf3 inside "
        "the ~0.4% bound asserted in tests/test_sketches.py",
    ),
    "user_reach_rolling_7d_hll": (
        1.0,
        0.01,
        "HLL lgK=17 estimate vs DuckDB exact distinct; +0.29% at sf3 inside "
        "the ~0.4% bound asserted in tests/test_sketches.py",
    ),
}

# ------------------------------------------------------- parquet compare

# Result sets measured >= ~1M rows at sf3 (SWEEP_sf3_r10.jsonl): at 100x
# the collect-and-sort compare is driver-bound (lineitem_unpivot hit
# spark.driver.maxResultSize at sf10 with 180M rows). min_sf per query.
PARQUET_COMPARE: dict[str, float] = {
    # sized-sketch sf10 runs: 17.0M verified pairs at 8x12 (r9 measured)
    # — far past any sane collect
    "embedding_near_dup_pairs": 10.0,
    "embedding_incremental_near_dups": 10.0,
    **{
        q: 3.0
        for q in [
        "lineitem_unpivot",
        "order_penny_allocation",
        "order_surrogate_keys",
        "order_value_quartiles",
        "orders_priority_decoded",
        "orders_zorder_keys",
        "rolling_7day_customer_revenue",
        "imputed_event_values",
        "event_session_windows",
        "user_activity_spans",
        "scd2_incremental_intervals",
        "event_type_intervals",
        "doc_prefix_fuzzy_pairs",
        "incremental_top3_orders",
        "top3_orders_per_customer",
        "user_daily_value_filled",
        ]
    },
}

# ----------------------------------------------------------------- utils


def infer_sf(sf_dir: str) -> float:
    """Scale factor from the sweep dir name (``.../sf10`` -> 10.0).
    ``SWEEP_SF`` overrides; an unrecognizable name routes nothing (0.0)
    — conservative: the pre-r11 monolithic behavior."""
    env = os.environ.get("SWEEP_SF")
    if env:
        return float(env)
    m = re.search(r"sf(\d+(?:\.\d+)?)$", os.path.basename(os.path.normpath(sf_dir)))
    return float(m.group(1)) if m else 0.0


def routing_enabled() -> bool:
    return os.environ.get("SWEEP_STAGED", "1") != "0"


def auto_skips(sf: float) -> dict[str, str]:
    return {q: reason for q, (min_sf, reason) in KNOWN_SKIPS.items() if sf >= min_sf}


def staged_groups(sf: float, queries) -> dict[tuple[str, str], list[str]]:
    """Group the routable subset of ``queries`` by (runner, group)."""
    groups: dict[tuple[str, str], list[str]] = {}
    for q in queries:
        route = STAGED_ORACLES.get(q)
        if route and sf >= route.min_sf:
            groups.setdefault((route.runner, route.group), []).append(q)
    return groups


def wants_parquet_compare(q: str, sf: float) -> bool:
    return sf >= PARQUET_COMPARE.get(q, math.inf)


def within_envelope(srows, drows, rel_tol: float) -> bool:
    """True iff the two sorted row lists differ only in numeric cells
    within ``rel_tol`` relative error. Row counts must match and rows
    pair positionally — a sort-order scramble fails closed (the record
    then stays a plain mismatch for a human to look at)."""
    if len(srows) != len(drows):
        return False
    for s, d in zip(srows, drows):
        if len(s) != len(d):
            return False
        for a, b in zip(s, d):
            if a == b:
                continue
            if isinstance(a, bool) or isinstance(b, bool):
                return False
            if not isinstance(a, (int, float)) or not isinstance(b, (int, float)):
                return False
            if math.isnan(a) or math.isnan(b):
                return False
            if abs(a - b) > rel_tol * max(abs(a), abs(b)):
                return False
    return True


_WORKDIR_MARKER = ".staged-oracle-workdir"


def fresh_workdir(path) -> Path:
    """Recreate a staged-runner scratch dir, refusing to delete anything
    that does not look like one (marker file): a mistyped positional arg
    (e.g. the sf_dir) must not be rmtree'd."""
    path = Path(path)
    if path.exists():
        if any(path.iterdir()) and not (path / _WORKDIR_MARKER).exists():
            raise SystemExit(
                f"refusing to delete non-empty {path}: no {_WORKDIR_MARKER} "
                "marker — not a staged-oracle workdir (mistyped argument?)"
            )
        shutil.rmtree(path)
    (path / "tmp").mkdir(parents=True)
    (path / _WORKDIR_MARKER).touch()
    return path


def shard_split(names: list[str], n_shards: int, shard: int, sf: float) -> set[str]:
    """Deterministic disjoint split of ``names`` for multi-process sweeps
    against one evidence file. Staged-oracle GROUPS are assigned whole
    (a family's runner must execute in exactly one process — two shards
    restaging one family's workdir corrupted in-flight reads, round-11),
    everything else round-robins by sorted unit key. Union over all
    shards == ``names``; pairwise disjoint."""
    grouped: dict[str, list[str]] = {}
    for q in names:
        sized = SIZED_SKETCH.get(q)
        route = STAGED_ORACLES.get(q)
        if sized and sf >= sized.min_sf:
            # the sized child sweep runs the whole sketch group in one
            # process (it owns the BDPE_EMB_SKETCH env for its family;
            # one model pick per sf_dir, so one group)
            key = "sized:emb"
        elif route and sf >= route.min_sf:
            key = f"group:{route.runner}:{route.group}"
        else:
            key = q
        grouped.setdefault(key, []).append(q)
    mine: set[str] = set()
    for i, key in enumerate(sorted(grouped)):
        if i % n_shards == shard:
            mine.update(grouped[key])
    return mine
