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
