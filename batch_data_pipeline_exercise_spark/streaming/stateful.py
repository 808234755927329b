"""Custom stateful streaming operator via ``applyInPandasWithState``.

The canonical shape for operators Structured Streaming lacks natively
(SURVEY §2.9 extension surface): per-key mutable state carried across
micro-batches, Arrow-batched pandas on the worker side. This one keeps a
running per-order status summary — event count, last status, first/last
event time — updated by each batch of the order-event stream; the same
skeleton hosts session aggregation, CDC folding, or online dedup state.

Scale notes: state lives in the state store partitioned by the grouping
key (one shuffle); per-batch work is O(batch) and state size is O(keys).
A timeout would evict idle keys (set ``GroupStateTimeout`` accordingly);
``NoTimeout`` here since order history is the product.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("last_status", T.StringType()),
        T.StructField("first_ts", T.TimestampType()),
        T.StructField("last_ts", T.TimestampType()),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("last_status", T.StringType()),
        T.StructField("first_ts", T.TimestampType()),
        T.StructField("last_ts", T.TimestampType()),
    ]
)


def fold_order_summary(state_tuple, pdfs: Iterator[pd.DataFrame]):
    """THE pure per-key summary fold, shared by the classic
    applyInPandasWithState operator below and the transformWithState
    twin (streaming/tws.py) so their semantics — including the NaT
    discipline — cannot drift apart.

    NaT event_times cannot win any first/last comparison, but on a
    key's FIRST batch "last_ts is None" would let a NaT row become the
    state's last event and poison every later comparison (ts > NaT is
    always False) — count them, then exclude them from the ordering
    entirely."""
    n, last_status, first_ts, last_ts = state_tuple
    for pdf in pdfs:
        n += len(pdf)
        pdf = pdf[pdf["event_time"].notna()].sort_values("event_time")
        if pdf.empty:
            continue
        last = pdf.iloc[-1]
        first = pdf.iloc[0]
        if first_ts is None or first["event_time"] < first_ts:
            first_ts = first["event_time"]
        if last_ts is None or last["event_time"] > last_ts:
            last_ts = last["event_time"]
            last_status = last["status"]
    return n, last_status, first_ts, last_ts


def _update_order_state(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (order_id,) = key
    if state.exists:
        prev = state.get
    else:
        prev = (0, None, None, None)
    n, last_status, first_ts, last_ts = fold_order_summary(prev, pdfs)

    state.update((n, last_status, first_ts, last_ts))
    yield pd.DataFrame(
        [(order_id, n, last_status, first_ts, last_ts)],
        columns=["id", "n_events", "last_status", "first_ts", "last_ts"],
    )


def order_state_stream(events: DataFrame) -> DataFrame:
    """Attach the stateful per-order summary operator to an order-event
    stream (columns: id, status, event_time)."""
    return events.groupBy("id").applyInPandasWithState(
        _update_order_state,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
