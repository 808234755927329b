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
