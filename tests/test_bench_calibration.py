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


def test_calibration_fields_quiet_box():
    """Three agreeing legs on a reference-speed box: best leg wins,
    spread ~1, not suspect."""
    ref = bench.CALIBRATION_REF_SEC
    f = bench.calibration_fields([ref * 1.05, ref, ref * 1.1])
    assert f["calibration_sec"] == round(ref, 3)
    assert f["calibration_legs"] == [round(ref * 1.05, 3), round(ref, 3), round(ref * 1.1, 3)]
    assert f["calibration_spread"] == round(1.1, 3)
    assert f["calibration_suspect"] is False


def test_calibration_fields_flags_midrun_contention():
    """The r12 failure mode: quiet legs before/after, a slow leg in the
    middle — spread > 1.15 marks the artifact noise-dominated even
    though the BEST leg (what value_normalized divides by) looks fine."""
    ref = bench.CALIBRATION_REF_SEC
    f = bench.calibration_fields([ref, ref * 1.4, ref * 1.02])
    assert f["calibration_spread"] > bench.CALIBRATION_MAX_SPREAD
    assert f["calibration_suspect"] is True
    # the headline still normalizes by the best leg — the flag is the signal
    assert f["calibration_sec"] == round(ref, 3)


def test_calibration_fields_flags_broken_probe():
    """ADVICE r12: a probe that collapses (constant-folded plan) or an
    implausibly slow box leaves the [0.2x, 5x] sane band — suspect even
    with perfectly agreeing legs, because value_normalized would then
    silently inflate/deflate with no signal."""
    ref = bench.CALIBRATION_REF_SEC
    lo, hi = bench.CALIBRATION_SANE_BAND
    fast = ref * lo * 0.5  # probe collapsed
    f = bench.calibration_fields([fast, fast, fast])
    assert f["calibration_suspect"] is True
    slow = ref * hi * 2  # box implausibly slow
    assert bench.calibration_fields([slow, slow])["calibration_suspect"] is True
    # band edges themselves are sane
    assert bench.calibration_fields([ref * lo, ref * lo])["calibration_suspect"] is False
    assert bench.calibration_fields([ref * hi * 0.999] * 2)["calibration_suspect"] is False


def test_calibration_cpu_legs_flag_counter_inflation():
    """r13 verdict task 2: the probe burns identical CPU every leg, so
    CPU-leg disagreement beyond CALIBRATION_CPU_MAX_SPREAD means the
    counter channel itself (cpu_total_sec — the documented primary
    cross-round signal) is contention-inflated this run: suspect, even
    when every WALL leg agrees (the r13 blind spot: 115 vs 210 s CPU
    attribution on identical code, both runs wall-plausible)."""
    ref = bench.CALIBRATION_REF_SEC
    quiet_walls = [ref, ref * 1.02, ref * 1.05]
    # agreeing CPU legs: not suspect, spread recorded
    f = bench.calibration_fields(quiet_walls, [40.0, 41.0, 40.5])
    assert f["calibration_cpu_legs"] == [40.0, 41.0, 40.5]
    assert f["calibration_cpu_spread"] == round(41.0 / 40.0, 3)
    assert f["calibration_suspect"] is False
    # inflated middle CPU leg with quiet walls: suspect fires
    f = bench.calibration_fields(quiet_walls, [40.0, 40.0 * 1.8, 41.0])
    assert f["calibration_cpu_spread"] > bench.CALIBRATION_CPU_MAX_SPREAD
    assert f["calibration_suspect"] is True


def test_calibration_cpu_legs_tolerate_missing_reads():
    """A leg whose UI read failed arrives as None: it must be excluded
    (recorded as null, never crashing the ratio), and fewer than two
    readable legs asserts nothing — no spread, no flag."""
    ref = bench.CALIBRATION_REF_SEC
    walls = [ref, ref * 1.01]
    f = bench.calibration_fields(walls, [None, 40.0])
    assert f["calibration_cpu_legs"] == [None, 40.0]
    assert "calibration_cpu_spread" not in f
    assert f["calibration_suspect"] is False
    # two valid + one None: the None is skipped, the valid pair compared
    f = bench.calibration_fields(walls, [40.0, None, 90.0])
    assert f["calibration_cpu_spread"] == round(90.0 / 40.0, 3)
    assert f["calibration_suspect"] is True
    # omitting cpu_legs entirely keeps the pre-r14 artifact shape
    f = bench.calibration_fields(walls)
    assert "calibration_cpu_legs" not in f and "calibration_cpu_spread" not in f


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
