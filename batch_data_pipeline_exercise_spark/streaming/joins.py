"""Stream-stream interval join: the streaming counterpart of the batch
as-of join (``operators/asof.py``).

Joining two unbounded streams needs BOTH sides watermarked and an
event-time range constraint in the join condition — that is what lets
the engine discard buffered rows: a click older than (purchase watermark
− window) can never match a future purchase, so its state is evicted.
Without the time bound the state store grows forever; with it, per-key
state is bounded by (watermark delay + join window) × arrival rate —
the same envelope at 1 or 1000 executors, since state shards by the
join key.

The batch as-of join answers "the LAST click before each purchase";
stream-stream inner joins can't express "last" (it needs to see the
whole past), so the streaming form emits EVERY click within the window
before the purchase — the standard attribution-join relaxation — and a
downstream per-purchase aggregate (or the batch as-of over the landed
bronze) picks the winner when exact last-touch is required.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def clicks_before_purchases(
    clicks: DataFrame,
    purchases: DataFrame,
    window: str = "1 hour",
    click_watermark: str = "2 hours",
    purchase_watermark: str = "1 hour",
    user_col: str = "user_id",
    time_col: str = "ts",
) -> DataFrame:
    """Attribution join: every (click, purchase) of the same user where
    the click lands in ``[purchase_ts - window, purchase_ts]``.

    Output: (user_id, click_ts, purchase_ts, click_event_id,
    purchase_event_id). Works on streaming AND batch frames (the
    identical plan is testable in batch; watermarks are no-ops there).
    """
    c = (
        clicks.select(
            F.col(user_col).alias("user_id"),
            F.col(time_col).alias("click_ts"),
            F.col("event_id").alias("click_event_id"),
        )
    )
    p = (
        purchases.select(
            F.col(user_col).alias("p_user_id"),
            F.col(time_col).alias("purchase_ts"),
            F.col("event_id").alias("purchase_event_id"),
        )
    )
    if c.isStreaming:
        c = c.withWatermark("click_ts", click_watermark)
    if p.isStreaming:
        p = p.withWatermark("purchase_ts", purchase_watermark)
    cond = (
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr(f"INTERVAL {window}"))
    )
    return c.join(p, cond).select(
        "user_id", "click_ts", "purchase_ts", "click_event_id", "purchase_event_id"
    )
