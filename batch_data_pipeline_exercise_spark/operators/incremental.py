"""Algebraic partial-aggregate maintenance.

The batch-warehouse pattern for aggregates at 100 TB: never re-scan all
history to refresh a rollup. Distributive measures (sum, count, min,
max) merge algebraically — ``agg(old ∪ new) == merge(agg(old),
agg(new))`` — so a daily run aggregates ONLY the new partition and folds
it into the stored rollup: per-batch cost tracks batch size, not table
size. (Averages and ratios come out of stored sum+count pairs at read
time; the merge itself stores only distributive parts. Exact decimal
sums make the merge bit-identical to the full recompute — the contract
query proves the equivalence against a full-scan oracle.)
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MERGE_FNS = {"sum": F.sum, "min": F.min, "max": F.max}


def merge_partial_aggs(
    parts: list[DataFrame],
    keys: list[str],
    merge_ops: dict[str, str],
) -> DataFrame:
    """Fold pre-aggregated parts into one rollup.

    Each part must already be aggregated to ``keys`` granularity with the
    measure columns named in ``merge_ops`` (column → ``sum`` | ``min`` |
    ``max``; counts merge via ``sum``). One union + one hash aggregate —
    map-side combine does most of the work since parts are already
    small."""
    if not parts:
        raise ValueError("merge_partial_aggs: parts must be non-empty")
    bad = {op for op in merge_ops.values() if op not in _MERGE_FNS}
    if bad:
        raise ValueError(f"merge_partial_aggs: non-distributive merge ops {sorted(bad)}")
    cols = keys + list(merge_ops)
    u = reduce(lambda a, b: a.unionByName(b), (p.select(*cols) for p in parts))
    return u.groupBy(*keys).agg(*[_MERGE_FNS[op](c).alias(c) for c, op in merge_ops.items()])


def maintain_topk(
    stored_topk: DataFrame | None,
    batch: DataFrame,
    keys: list[str],
    order_cols: list,
    k: int,
    rank_col: str = "rnk",
) -> DataFrame:
    """Incrementally maintain a per-key top-k table under insert-only
    batches: ``topk(stored_topk ∪ batch) == topk(history ∪ batch)``.

    Top-k is itself algebraic for insertions — a row outside a key's
    current top k can never re-enter it when more rows arrive — so the
    maintained table IS the full-recompute result (the rebuild-
    equivalence test and the driver oracle prove it). Per-batch cost:
    a window over ``|batch| + k·|keys touched|`` rows, never history.
    Deletions/updates break the algebra (an evicted row might need to
    come back) — that's a rebuild, by design.

    ``order_cols``: ranking order (include a unique tiebreak for
    determinism). ``stored_topk=None`` bootstraps from the first batch.
    The stored side's ``rank_col`` (if present) is dropped and
    recomputed.
    """
    from pyspark.sql.window import Window

    cols = [c for c in batch.columns if c != rank_col]
    parts = batch.select(*cols)
    if stored_topk is not None:
        parts = stored_topk.select(*cols).unionByName(parts)
    w = Window.partitionBy(*keys).orderBy(*order_cols)
    return (
        parts.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )
