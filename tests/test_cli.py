"""CLI argument-validation tests — malformed timestamps must fail fast
with exit 2 and a JSON error, never reach the engine (where non-ANSI
casts would silently turn them into NULLs)."""

from __future__ import annotations

import json

import pytest

from batch_data_pipeline_exercise_spark.__main__ import main


def run_cli(capsys, argv):
    code = main(argv)
    captured = capsys.readouterr()
    err = json.loads(captured.err) if captured.err else None
    return code, err


@pytest.mark.parametrize(
    "argv, needle",
    [
        (["run", "--feed", "orders", "--csv", "x.csv", "--ts", "garbage", "--warehouse", "/tmp/w"], "--ts"),
        (["run", "--feed", "orders", "--csv", "x.csv", "--ts", "2021-13-45 99:00:00", "--warehouse", "/tmp/w"], "--ts"),
        (["metric", "--name", "current_orders_by_status", "--warehouse", "/tmp/w"], "requires --as-of"),
        (["metric", "--name", "retained_orders", "--warehouse", "/tmp/w"], "requires --as-of"),
        (["metric", "--name", "current_orders_by_status", "--as-of", "not-a-ts", "--warehouse", "/tmp/w"], "--as-of"),
        (
            ["metric", "--name", "daily_stock_by_category", "--date-from", "2021/01/01",
             "--date-to", "2021-02-01", "--warehouse", "/tmp/w"],
            "--date-from",
        ),
    ],
)
def test_invalid_args_exit_2_with_json_error(capsys, argv, needle):
    code, err = run_cli(capsys, argv)
    assert code == 2
    assert err is not None and err["ok"] is False and needle in err["error"]


def test_valid_ts_formats_pass_validation():
    from batch_data_pipeline_exercise_spark.__main__ import _valid_ts

    assert _valid_ts("2021-03-01 01:00:00")
    assert _valid_ts("2021-03-01 01:00:00.123456")
    assert _valid_ts("2021-03-01")
    assert not _valid_ts("01-03-2021")
    assert not _valid_ts("")
