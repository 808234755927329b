"""Evidence router: the ordering that decides which queries land in the
driver's bounded CORRECTNESS window each round. No Spark needed."""

from __future__ import annotations

import importlib.util
import json
import sys
from pathlib import Path


def _entry_module():
    spec = importlib.util.spec_from_file_location(
        "entry_under_test", Path(__file__).resolve().parent.parent / "__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["entry_under_test"] = mod
    spec.loader.exec_module(mod)
    return mod


def _write_round(tmp_path, n, rows):
    (tmp_path / f"CORRECTNESS_r{n:02d}.json").write_text(json.dumps(rows))


GREEN = {"rows_match": True, "schema_match": True, "hash_match": True, "spark_rows": 1, "oracle_rows": 1, "err": None}
RED = {"rows_match": False, "schema_match": True, "hash_match": False, "spark_rows": 1, "oracle_rows": 2, "err": "boom"}
ROWS_ONLY = {"rows_match": None, "schema_match": None, "hash_match": None, "spark_rows": 7, "oracle_rows": None, "err": "no_oracle"}


def test_latest_red_leads_the_window(tmp_path):
    """A query whose MOST RECENT verdict is red must sort first even if
    it has more greens than everyone else — the round-4 failure mode was
    a fixed query (2 greens, then 1 red) rotating OUT of the window."""
    m = _entry_module()
    _write_round(tmp_path, 1, {"fixed_bug": GREEN, "other": GREEN})
    _write_round(tmp_path, 2, {"fixed_bug": GREEN})
    _write_round(tmp_path, 3, {"fixed_bug": RED, "never2": GREEN})
    order = m._evidence_order(["other", "never2", "brand_new", "fixed_bug"], str(tmp_path))
    assert order[0] == "fixed_bug"
    # never-checked before any green
    assert order[1] == "brand_new"
    # fewest-green next: other (1 green) before never2? both 1 green —
    # staleness tiebreak: other last checked r1, never2 checked r3
    assert order[2:] == ["other", "never2"]


def test_green_again_clears_the_red_flag(tmp_path):
    m = _entry_module()
    _write_round(tmp_path, 1, {"q": RED})
    _write_round(tmp_path, 2, {"q": GREEN, "other": GREEN, "other2": GREEN})
    order = m._evidence_order(["other", "q", "other2"], str(tmp_path))
    # q: latest green, 1 green total, last checked r2 — ties with the
    # others on (tier, count, round); stable sort keeps input order
    assert order == ["other", "q", "other2"]


def test_rows_only_counts_as_green(tmp_path):
    m = _entry_module()
    _write_round(tmp_path, 1, {"no_oracle_q": ROWS_ONLY, "red_q": RED})
    order = m._evidence_order(["no_oracle_q", "red_q"], str(tmp_path))
    assert order == ["red_q", "no_oracle_q"]


def test_staleness_rotates_within_equal_green_counts(tmp_path):
    """Once-checked queries re-enter the window oldest-evidence-first, so
    the rotation doesn't re-verify what the driver just verified."""
    m = _entry_module()
    _write_round(tmp_path, 1, {"old_green": GREEN})
    _write_round(tmp_path, 2, {"mid_green": GREEN})
    _write_round(tmp_path, 3, {"new_green": GREEN})
    order = m._evidence_order(["new_green", "mid_green", "old_green"], str(tmp_path))
    assert order == ["old_green", "mid_green", "new_green"]


def test_malformed_evidence_files_are_ignored(tmp_path):
    m = _entry_module()
    (tmp_path / "CORRECTNESS_r01.json").write_text("[1, 2, 3]")  # non-dict top level
    (tmp_path / "CORRECTNESS_r02.json").write_text("{not json")
    _write_round(tmp_path, 3, {"q": GREEN, "bad_row": "not-a-dict"})
    order = m._evidence_order(["q", "bad_row"], str(tmp_path))
    assert order == ["bad_row", "q"]  # bad_row never counted -> tier -1


def _expected_tiers(m, names, evidence_dir=None):
    """Derive the ordering law's tier sets straight from the evidence
    files on disk — never pin a round-specific query name here (the
    driver rewrites CORRECTNESS files *after* each commit, so any
    name-pin goes stale the moment the router does its job)."""
    counts, latest_red, _ = m._driver_evidence(evidence_dir)
    reds = {n for n in names if latest_red.get(n, False)}
    never = {n for n in names if n not in counts}
    return reds, never


def test_repo_ordering_matches_registry_and_ordering_law():
    """Against the REAL CORRECTNESS files: queries()/oracle_sql() agree on
    ordering and the ordering law holds — latest-red first, then
    never-checked, with the tier-0/tier-never sets derived from the same
    evidence files the router reads (artifact-relative, round-agnostic)."""
    m = _entry_module()
    qs, osql = m.queries(), m.oracle_sql()
    assert set(osql) <= set(qs)
    names = list(qs)
    reds, never = _expected_tiers(m, names)
    # tier 0 (latest-red) occupies a strict prefix, then all never-checked
    assert set(names[: len(reds)]) == reds
    assert set(names[len(reds) : len(reds) + len(never)]) == never
    # oracle ordering is the queries ordering restricted to oracle keys
    assert [n for n in qs if n in osql] == list(osql)


def test_repo_ordering_survives_future_round_file(tmp_path):
    """The law must keep holding when a hypothetical next-round file
    lands: copy the real evidence into a fixture dir, append an r99 file
    that greens the current leader, and re-derive — no name pins."""
    import shutil

    m = _entry_module()
    root = Path(__file__).resolve().parent.parent
    for p in sorted(root.glob("CORRECTNESS_r*.json")):
        shutil.copy(p, tmp_path / p.name)
    names = list(m.queries())
    leader = names[0]
    _write_round(tmp_path, 99, {leader: GREEN})
    order = m._evidence_order(names, str(tmp_path))
    reds, never = _expected_tiers(m, names, str(tmp_path))
    assert leader not in reds  # the green row cleared its flag
    assert set(order[: len(reds)]) == reds
    assert set(order[len(reds) : len(reds) + len(never)]) == never
