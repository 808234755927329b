"""Randomized invariants for interval coalescing and winsorization.

Hypothesis drives the INPUT GENERATION only; each case asserts exact
structural invariants (no tolerances), mirroring the scd2 property-test
style. Spark session work per example is expensive, so examples are
bounded and deadlines disabled.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from batch_data_pipeline_exercise_spark.operators.intervals import coalesce_intervals
from batch_data_pipeline_exercise_spark.operators.robust import winsorize

interval_lists = st.lists(
    st.tuples(st.integers(0, 200), st.integers(0, 50)),  # (start, length)
    min_size=1,
    max_size=25,
)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(ivs=interval_lists)
def test_coalesce_intervals_invariants(spark, ivs):
    rows = [("k", i, s, s + ln) for i, (s, ln) in enumerate(ivs)]
    df = spark.createDataFrame(rows, "k string, id int, s bigint, e bigint")
    spans = sorted(
        (r["span_start"], r["span_end"], r["n_intervals"])
        for r in coalesce_intervals(df, ["k"], "s", "e", "id").collect()
    )
    # spans are disjoint with real gaps between them, in order
    for (s1, e1, _), (s2, e2, _) in zip(spans, spans[1:]):
        assert e1 < s2
    # interval counts account for every input
    assert sum(n for _, _, n in spans) == len(rows)
    # every input interval is contained in exactly one span
    for _, _, s, e in rows:
        hits = [sp for sp in spans if sp[0] <= s and e <= sp[1]]
        assert len(hits) == 1
    # coalescing is idempotent: re-coalescing the spans changes nothing
    sdf = spark.createDataFrame(
        [("k", i, a, b) for i, (a, b, _) in enumerate(spans)],
        "k string, id int, s bigint, e bigint",
    )
    again = sorted(
        (r["span_start"], r["span_end"]) for r in coalesce_intervals(sdf, ["k"], "s", "e", "id").collect()
    )
    assert again == [(a, b) for a, b, _ in spans]


values_lists = st.lists(st.integers(-1000, 1000), min_size=1, max_size=40)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(vals=values_lists)
def test_winsorize_invariants(spark, vals):
    rows = [(i, "g", float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "id int, g string, v double")
    out = winsorize(df, "v", ["g"], "id", 5, 95, out_col="w").collect()
    n = len(vals)
    srt = sorted(vals)
    lo = float(srt[(n * 5 + 99) // 100 - 1])
    hi = float(srt[(n * 95 + 99) // 100 - 1])
    for r in out:
        # bounds are the discrete percentiles of the group
        assert r["__p_lo"] == lo and r["__p_hi"] == hi
        # clamped into [lo, hi]; interior values unchanged
        assert lo <= r["w"] <= hi
        if lo <= r["v"] <= hi:
            assert r["w"] == r["v"]
    # winsorization never reorders: rank by w is consistent with rank by v
    byv = sorted(out, key=lambda r: (r["v"], r["id"]))
    assert all(a["w"] <= b["w"] for a, b in zip(byv, byv[1:]))
