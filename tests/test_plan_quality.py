"""Plan-quality gate: every contract query must compile to a scale-safe
physical plan.

Checks, per query (at sf0.001 — plan shape, not data):

- no CartesianProduct / BroadcastNestedLoopJoin unless the query is
  explicitly registered ``allow_quadratic`` (brute-force similarity
  baselines);
- no unpartitioned Window (``Window.orderBy`` with empty partition spec)
  in ANY query — a global window funnels the whole table through one
  task; the scalable alternatives live in ``operators/ranking.py``;
- parquet scans never read all columns when the query uses few (column
  pruning reached the scan).

This is the regression net for the 100 TB design rules: an accidental
non-equi join, lost pushdown, or single-partition sort fails CI, not the
cluster.
"""

from __future__ import annotations

import pytest

from batch_data_pipeline_exercise_spark.plans import contract
from batch_data_pipeline_exercise_spark.plans import contract2, contract3, contract4, contract5, contract6, contract_ext  # noqa: F401

QUADRATIC = {"CartesianProduct", "BroadcastNestedLoopJoin"}


def unpartitioned_window_specs(plan: str) -> list[str]:
    """``windowspecdefinition(...)`` occurrences whose FIRST top-level
    argument is an ordering expression (carries ASC/DESC) — i.e. the
    partition-column list is empty. Partitioned specs lead with plain
    attribute arguments, which never carry a sort direction."""
    found, i, needle = [], 0, "windowspecdefinition("
    while (j := plan.find(needle, i)) >= 0:
        k, depth, first, done = j + len(needle), 1, [], False
        while k < len(plan) and depth > 0:
            ch = plan[k]
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif ch == "," and depth == 1:
                done = True
            if not done and depth > 0:
                first.append(ch)
            k += 1
        arg = "".join(first)
        if " ASC" in arg or " DESC" in arg:
            found.append(plan[j:k])
        i = k
    return found


# Expensive expressions that must never appear INSIDE a higher-order
# function's lambda body: a Column subtree referenced from a lambda is
# embedded there and re-evaluates PER ARRAY ELEMENT — the O(len²)
# pathology fixed in round 8 (text.bind_once). Regexes and digests over
# per-row data belong OUTSIDE the lambda, bound once.
EXPENSIVE_IN_LAMBDA = ("regexp_", "md5(", "sha1(", "sha2(", "xxhash64(", "levenshtein(", "conv(")


def expensive_lambda_bodies(plan: str) -> list[str]:
    """``lambdafunction(...)`` spans whose balanced-paren body mentions an
    EXPENSIVE_IN_LAMBDA needle."""
    found, i, needle = [], 0, "lambdafunction("
    while (j := plan.find(needle, i)) >= 0:
        k, depth = j + len(needle), 1
        while k < len(plan) and depth > 0:
            if plan[k] == "(":
                depth += 1
            elif plan[k] == ")":
                depth -= 1
            k += 1
        body = plan[j:k]
        if any(n in body for n in EXPENSIVE_IN_LAMBDA):
            found.append(body[:400])
        i = k
    return found


@pytest.mark.parametrize("name", sorted(contract.REGISTRY))
def test_plan_is_scale_safe(spark, sf_dir, name):
    q = contract.REGISTRY[name]
    plan = q.fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    if not q.allow_quadratic:
        for bad in QUADRATIC:
            assert bad not in plan, f"{name}: {bad} in physical plan\n{plan}"
    unpart = unpartitioned_window_specs(plan)
    assert not unpart, f"{name}: unpartitioned (global) window in physical plan:\n" + "\n".join(unpart)
    hot = expensive_lambda_bodies(plan)
    assert not hot, (
        f"{name}: expensive expression inside a HOF lambda (re-evaluates per "
        f"array element — bind it once via text.bind_once or a materialized "
        f"column):\n" + "\n".join(hot)
    )


def test_quadratic_allowlist_is_small():
    allowed = [n for n, q in contract.REGISTRY.items() if q.allow_quadratic]
    # embedding_near_dup_pairs left this list in round 4: multi-band
    # sign-LSH (bucketed equi self-join per band) replaced the exact
    # all-pairs join
    assert set(allowed) == {
        "ann_cosine_topk",          # brute-force baseline (quadratic by intent)
        "ann_cosine_topk_ivf",       # bounded n×n_cells broadcast expansion (linear)
        "ann_cosine_topk_ivf_kmeans",  # same bounded expansion, trained centroids
        "ivf_cell_occupancy",        # the same bounded n×n_cells assignment, reported
        # exact all-pairs Jaccard baseline: the plan is shingle-key
        # equi-joins (no BNLJ, passes the plan gate regardless), but the
        # WORK is quadratic in per-shingle co-occurrence — the sf1 sweep
        # proved it (AGGREGATE_OUT_OF_MEMORY on the candidate groupBy
        # while the MinHash-LSH scale path sailed through); flagging it
        # makes the small-corpus-tool status machine-readable
        "doc_ngram_jaccard_pairs",
    }
