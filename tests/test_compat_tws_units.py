"""Driver-free unit tests for the round-7 hardening fixes: the scoped
protobuf worker shim (compat.worker_env_conf), the timezone-independent
timer deadline, and NULL-status safety in the ListState buffer. None of
these need a SparkSession — they pin the pure-Python contracts that the
streaming integration tests then exercise end-to-end."""

from __future__ import annotations

import datetime
import os

import pandas as pd

from batch_data_pipeline_exercise_spark import compat
from batch_data_pipeline_exercise_spark.streaming import tws


def test_worker_env_conf_is_scoped_not_global():
    """The shim must ride spark.executorEnv.PYTHONPATH (read at context
    creation, shipped only to Spark Python workers) — NOT a process-wide
    os.environ mutation that would leak the sitecustomize patch into
    every subsequently spawned Python process."""
    before = os.environ.get("PYTHONPATH")
    conf = compat.worker_env_conf()
    assert os.environ.get("PYTHONPATH") == before
    if conf:  # fallback active on this image (no installed protobuf)
        assert conf == {"spark.executorEnv.PYTHONPATH": compat.PBSHIM_DIR}
    # the shim ships inside the package: present even without tests/
    assert os.path.isfile(os.path.join(compat.PBSHIM_DIR, "sitecustomize.py"))
    assert "tests" not in compat.PBSHIM_DIR.split(os.sep)


def test_silence_deadline_is_timezone_independent():
    """last is a naive pd.Timestamp on the first batch but a naive
    datetime after a ValueState round-trip; both must map to the same
    epoch (naive wall time read as UTC), on any host timezone."""
    t_pd = pd.Timestamp("2021-03-01 08:00:00")
    t_dt = datetime.datetime(2021, 3, 1, 8, 0, 0)
    a = tws.OrderSilenceProcessor._deadline_ms(t_pd)
    b = tws.OrderSilenceProcessor._deadline_ms(t_dt)
    # 2021-03-01T08:00:00Z == 1614585600 epoch seconds, independent of TZ
    assert a == b == 1_614_585_600_000 + tws.SESSION_GAP_MS
    # tz-aware inputs (session-timezone / pandas-arrow config drift) must
    # normalize to the same instant, not raise on aware-minus-naive
    t_utc = pd.Timestamp("2021-03-01 08:00:00", tz="UTC")
    t_off = pd.Timestamp("2021-03-01 03:00:00", tz="America/New_York")  # == 08:00Z
    assert tws.OrderSilenceProcessor._deadline_ms(t_utc) == a
    assert tws.OrderSilenceProcessor._deadline_ms(t_off) == a


class _FakeListState:
    def __init__(self):
        self._rows = None

    def exists(self) -> bool:
        return self._rows is not None

    def get(self):
        return iter(self._rows)

    def put(self, rows) -> None:
        self._rows = [tuple(r) for r in rows]


def test_recent_events_buffers_null_status():
    """A None status must be normalized to the shared '__null' sentinel
    (same as the MapState twin), not crash the (ts, status) sort or the
    ','.join mid-stream."""
    p = tws.RecentEventsProcessor()
    p._recent = _FakeListState()
    pdf = pd.DataFrame(
        {
            "status": ["created", None, "completed"],
            "event_time": pd.to_datetime(
                ["2021-03-01 08:00:00", "2021-03-01 08:30:00", "2021-03-01 09:00:00"]
            ),
        }
    )
    (out,) = list(p.handleInputRows(("o1",), iter([pdf]), None))
    row = out.iloc[0]
    assert row["n_recent"] == 3
    assert row["recent_statuses"] == f"created,{tws.NULL_STATUS},completed"
    # and the normalized sentinel (not None) is what went into state
    assert all(s is not None for _, s in p._recent._rows)


def test_pbshim_retirement_tripwire():
    """The _pbshim exists ONLY because the image ships no installed
    google.protobuf >= 6.33.0 (the machine-checkable retirement note at
    compat.py:41-46: pyspark 4.1.2's generated state-protocol code
    demands 6.33.0 and the only discoverable runtime is the cloud-sdk
    bundled 6.32.0). This test is the tripwire: it goes RED the moment
    an image bump ships a sufficient INSTALLED protobuf, so the shim
    cannot outlive its reason. importlib.metadata sees only installed
    distributions — the shim's PYTHONPATH-vendored copy has no dist
    metadata, so the shim cannot satisfy its own retirement check."""
    import importlib.metadata

    try:
        ver = importlib.metadata.version("protobuf")
    except importlib.metadata.PackageNotFoundError:
        return  # no installed protobuf: the shim is still load-bearing
    major, minor = (int(x) for x in ver.split(".")[:2])
    assert (major, minor) < (6, 33), (
        f"Installed protobuf {ver} satisfies pyspark's >= 6.33.0 gencode "
        "requirement: DELETE batch_data_pipeline_exercise_spark/_pbshim, "
        "compat.ensure_protobuf's lenient version patch, and this test "
        "(see the retirement note in compat.py)."
    )
