"""Per-order summary on Spark 4's ``transformWithStateInPandas`` — the
successor arbitrary-state API to ``applyInPandasWithState``
(streaming/stateful.py keeps the classic twin; both compute the same
summary, which the parity test pins).

Why carry both: transformWithState is where Structured Streaming's
custom-state investment is going — typed state handles (value/list/map
state instead of one tuple), explicit processor lifecycle, timers, TTL,
and the RocksDB state store requirement that makes state spillable
instead of heap-bound. At 100 TB-scale key counts that last property is
the difference between a stateful operator that runs and one that OOMs:
the classic API's HDFS-backed store keeps every key's state on the JVM
heap, while RocksDB pages cold keys to local SSD.

Same NULL discipline as the classic twin: NaT event times are counted
but excluded from first/last ordering (a NaT row must never become the
state's "last" event, and NaT > comparisons are always false).

Environment note: the transformWithState protocol speaks protobuf
between the JVM and the Python state client. ``google.protobuf`` is not
a pyspark install dependency; where no installed copy exists,
``batch_data_pipeline_exercise_spark/compat.py`` falls back to a
vendored pure-Python runtime (and ``_pbshim/sitecustomize.py``, shipped
on ``spark.executorEnv.PYTHONPATH`` by ``session.get_spark``, applies
the same fallback inside spawned Python workers), so the parity test
runs rather than skips. On images with neither an installed nor a
vendored runtime it still skips cleanly via importorskip.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.stateful_processor import StatefulProcessor, StatefulProcessorHandle
from pyspark.sql.types import StructType

from batch_data_pipeline_exercise_spark.streaming.stateful import (
    OUTPUT_SCHEMA,
    STATE_SCHEMA,
    fold_order_summary,
)

ROCKSDB_PROVIDER = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

#: sentinel for NULL status values — shared by the ListState buffer and
#: the MapState counter (a None can neither key a MapState row nor feed
#: a (ts, status) tuple sort without TypeError)
NULL_STATUS = "__null"


class OrderStateProcessor(StatefulProcessor):
    """Running (n_events, last_status, first_ts, last_ts) per order id."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("order_summary", STATE_SCHEMA)

    def handleInputRows(self, key, rows: Iterator[pd.DataFrame], timer_values) -> Iterator[pd.DataFrame]:
        (order_id,) = key
        prev = self._state.get() if self._state.exists() else (0, None, None, None)
        # SHARED fold with the classic twin (stateful.fold_order_summary)
        # — parity holds by construction, not by test alone
        n, last_status, first_ts, last_ts = fold_order_summary(prev, rows)
        self._state.update((n, last_status, first_ts, last_ts))
        yield pd.DataFrame(
            [(order_id, n, last_status, first_ts, last_ts)],
            columns=["id", "n_events", "last_status", "first_ts", "last_ts"],
        )

    def close(self) -> None:
        pass


def order_state_stream_tws(events: DataFrame) -> DataFrame:
    """Attach the transformWithState per-order summary to an order-event
    stream (columns: id, status, event_time). The session must run the
    RocksDB state store provider (``ROCKSDB_PROVIDER``) — the API
    requires it, and it is the scale story (state spills to local disk
    instead of living on the heap)."""
    return events.groupBy("id").transformWithStateInPandas(
        statefulProcessor=OrderStateProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


# ---------------------------------------------------------------------------
# ListState exemplar: bounded per-key recent-event buffer
# ---------------------------------------------------------------------------

RECENT_K = 3

RECENT_STATE_SCHEMA = StructType(
    [
        T.StructField("event_time", T.TimestampType()),
        T.StructField("status", T.StringType()),
    ]
)

RECENT_OUTPUT_SCHEMA = StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("n_recent", T.LongType()),
        T.StructField("recent_statuses", T.StringType()),
    ]
)


class RecentEventsProcessor(StatefulProcessor):
    """Last-``RECENT_K`` events per order via **ListState** — the typed
    state handle the classic applyInPandasWithState API lacks (there the
    whole buffer would round-trip through one opaque tuple each batch).
    The buffer is re-capped on every update, so state per key is O(K) by
    construction — the property that keeps a billion-key stream's state
    bounded. Ordering is (event_time, status) with NaT rows excluded,
    the same NaT discipline as the summary fold."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._recent = handle.getListState("recent_events", RECENT_STATE_SCHEMA)

    def handleInputRows(self, key, rows: Iterator[pd.DataFrame], timer_values) -> Iterator[pd.DataFrame]:
        (order_id,) = key
        buf = [(r[0], r[1]) for r in self._recent.get()] if self._recent.exists() else []
        for pdf in rows:
            pdf = pdf[pdf["event_time"].notna()]
            # NULL statuses must not reach the (ts, status) sort key or the
            # ','.join — normalize to the same '__null' sentinel the
            # MapState twin uses instead of raising TypeError mid-stream.
            statuses = pdf["status"].fillna(NULL_STATUS)
            buf.extend(zip(pdf["event_time"], statuses))
        buf.sort(key=lambda t: (t[0], t[1]))
        buf = buf[-RECENT_K:]
        self._recent.put(buf)
        yield pd.DataFrame(
            [(order_id, len(buf), ",".join(s for _, s in buf))],
            columns=["id", "n_recent", "recent_statuses"],
        )

    def close(self) -> None:
        pass


def recent_events_stream_tws(events: DataFrame) -> DataFrame:
    """Attach the bounded recent-event buffer to an order-event stream
    (columns: id, status, event_time). RocksDB provider required, as for
    every transformWithState operator."""
    return events.groupBy("id").transformWithStateInPandas(
        statefulProcessor=RecentEventsProcessor(),
        outputStructType=RECENT_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


# ---------------------------------------------------------------------------
# MapState exemplar: per-key per-status running counts
# ---------------------------------------------------------------------------

STATUS_KEY_SCHEMA = StructType([T.StructField("status", T.StringType())])
STATUS_VAL_SCHEMA = StructType([T.StructField("n", T.LongType())])

STATUS_OUTPUT_SCHEMA = StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("n", T.LongType()),
    ]
)


class StatusCountsProcessor(StatefulProcessor):
    """Per-order per-status event counts in a **MapState** — the third
    typed handle (value/list/map), completing the surface. A MapState
    updates ONE sub-key per write instead of rewriting the whole
    per-key blob: with S statuses and one hot status per batch, the
    per-batch state write is O(1) sub-keys, not O(S) — the difference
    that matters when the map is large (think per-user per-item counts)
    and the store is RocksDB. NULL statuses are counted under the
    sentinel '__null' (a None map key would not round-trip the state
    protocol's typed tuple)."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._counts = handle.getMapState("status_counts", STATUS_KEY_SCHEMA, STATUS_VAL_SCHEMA)

    def handleInputRows(self, key, rows: Iterator[pd.DataFrame], timer_values) -> Iterator[pd.DataFrame]:
        (order_id,) = key
        batch: dict[str, int] = {}
        for pdf in rows:
            for s in pdf["status"]:
                s = NULL_STATUS if s is None or (isinstance(s, float) and pd.isna(s)) else s
                batch[s] = batch.get(s, 0) + 1
        for s, add in batch.items():
            prev = self._counts.getValue((s,))[0] if self._counts.containsKey((s,)) else 0
            self._counts.updateValue((s,), (prev + add,))
        out = sorted((k[0], v[0]) for k, v in self._counts.iterator())
        yield pd.DataFrame(
            [(order_id, s, n) for s, n in out], columns=["id", "status", "n"]
        )

    def close(self) -> None:
        pass


def status_counts_stream_tws(events: DataFrame) -> DataFrame:
    """Attach the per-status count map to an order-event stream
    (columns: id, status, event_time)."""
    return events.groupBy("id").transformWithStateInPandas(
        statefulProcessor=StatusCountsProcessor(),
        outputStructType=STATUS_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


# ---------------------------------------------------------------------------
# Event-time timers: silence (timeout) detection
# ---------------------------------------------------------------------------

SESSION_GAP_MS = 30 * 60 * 1000

SESSION_STATE_SCHEMA = StructType(
    [
        T.StructField("start_ts", T.TimestampType()),
        T.StructField("last_ts", T.TimestampType()),
        T.StructField("n", T.LongType()),
    ]
)

SESSION_OUTPUT_SCHEMA = StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("start_ts", T.TimestampType()),
        T.StructField("end_ts", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
    ]
)


class OrderSilenceProcessor(StatefulProcessor):
    """**Event-time timer** exemplar: emit one row per key when the key
    goes SILENT — no event for ``SESSION_GAP_MS`` as judged by the
    WATERMARK, not the wall clock. This is the timeout/abandonment
    pattern (order stuck in 'created', cart abandonment, heartbeat
    loss) that no windowing aggregation expresses: the trigger is the
    *absence* of data, so only a timer can fire it.

    Mechanics: every batch folds the key's events into one
    (start, last, n) value state and re-arms a single timer at
    last + gap (older timers deleted — one timer per key, so timer
    state is O(keys)). When the watermark passes the deadline the timer
    fires, the summary row is emitted, and state + timer are cleared —
    a key that revives later starts a fresh cycle. Emission happens
    ONLY from ``handleExpiredTimer``: in this Spark build's EventTime
    mode, rows emitted from the data phase (and flush rows whose event
    times precede the firing key's newest state) are dropped by the
    exec's output handling, so the operator's contract is exactly the
    reliable subset — one silence row per key per quiet period.
    State size tracks keys currently inside a quiet-period watch.
    """

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._sess = handle.getValueState("watched", SESSION_STATE_SCHEMA)

    @staticmethod
    def _deadline_ms(last) -> int:
        # `last` is a naive pd.Timestamp on the first batch but a naive
        # datetime after a state round-trip; .timestamp() would treat the
        # former as UTC and the latter as HOST-local time, shifting
        # deadlines by the UTC offset on any non-UTC machine. Compute
        # epoch ms via Timedelta arithmetic so naive wall time is always
        # read as UTC, identically for both types. A tz-aware input
        # (possible under a non-default session timezone / arrow config)
        # is normalized to naive UTC first — aware minus naive raises.
        ts = pd.Timestamp(last)
        if ts.tzinfo is not None:
            ts = ts.tz_convert("UTC").tz_localize(None)
        epoch_ms = int((ts - pd.Timestamp(0)) // pd.Timedelta(milliseconds=1))
        return epoch_ms + SESSION_GAP_MS

    def handleInputRows(self, key, rows: Iterator[pd.DataFrame], timer_values) -> Iterator[pd.DataFrame]:
        ts = []
        for pdf in rows:
            ts.extend(pdf["event_time"][pdf["event_time"].notna()])
        if not ts:
            return
        lo, hi, add = min(ts), max(ts), len(ts)
        if self._sess.exists():
            start, last, n = self._sess.get()
            start, last, n = min(start, lo), max(last, hi), n + add
        else:
            start, last, n = lo, hi, add
        self._sess.update((start, last, n))
        # single live timer per key at the newest deadline
        target = self._deadline_ms(last)
        for old in list(self._handle.listTimers()):
            if old != target:
                self._handle.deleteTimer(old)
        self._handle.registerTimer(target)
        return
        yield  # pragma: no cover — generator form required by the API

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo) -> Iterator[pd.DataFrame]:  # noqa: N803
        (order_id,) = key
        if not self._sess.exists():
            return
        start, last, n = self._sess.get()
        if self._deadline_ms(last) > timerValues.getCurrentWatermarkInMs():
            return  # stale timer: the key spoke again after this was armed
        self._sess.clear()
        yield pd.DataFrame(
            [(order_id, pd.Timestamp(start), pd.Timestamp(last), int(n))],
            columns=["id", "start_ts", "end_ts", "n_events"],
        )

    def close(self) -> None:
        pass


def silent_orders_stream_tws(events: DataFrame) -> DataFrame:
    """Watermark-judged key-silence rows for an order-event stream
    (columns: id, status, event_time). ``events`` must carry a
    watermark on ``event_time`` — the timer clock IS the watermark.
    RocksDB provider required, as for every transformWithState
    operator."""
    return events.groupBy("id").transformWithStateInPandas(
        statefulProcessor=OrderSilenceProcessor(),
        outputStructType=SESSION_OUTPUT_SCHEMA,
        outputMode="Append",
        timeMode="EventTime",
    )
