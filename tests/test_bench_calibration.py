"""Bench calibration probe (round-11 verdict task 2): the round-over-
round BENCH artifact stopped being a code signal once the sandbox box
drifted ~25-35% between driver runs (identical r10 code: 23.2 s on the
r10 run, 28.6-31.1 s re-measured in r11). bench.py therefore carries a
fixed-work, generated-in-memory CPU probe and reports both the raw
headline and ``value_normalized`` (rescaled to a pinned reference-box
probe time), so future rounds compare code, not host."""

from __future__ import annotations

import bench


def test_calibration_fn_is_fixed_work(spark):
    """The probe's work is pinned: 2^28 input rows through a fixed
    64-partition plan into exactly 97 buckets — nothing (AQE, input
    files, data content) can change the work per round."""
    rows = bench._calibration_fn(spark).collect()
    assert len(rows) == 97
    assert sum(r["n"] for r in rows) == 1 << 28


def test_calibration_fn_partitioning_is_pinned(spark):
    """64-way parallelism is set in the plan, not inherited from session
    defaults — a shuffle-partition change must not alter probe work."""
    df = spark.range(0, 1 << 28, 1, 64)
    assert df.rdd.getNumPartitions() == 64


def test_normalization_identity():
    """``normalized_headline`` — the exact function main() emits as
    value_normalized: on a box exactly as fast as the reference,
    normalized == raw; on a 2x-slower box the headline is halved back
    to reference terms; a swapped ratio would fail both."""
    ref = bench.CALIBRATION_REF_SEC
    assert ref > 0
    assert bench.normalized_headline(30.0, ref) == 30.0
    assert bench.normalized_headline(30.0, 2 * ref) == 15.0
    assert bench.normalized_headline(30.0, ref / 2) == 60.0
