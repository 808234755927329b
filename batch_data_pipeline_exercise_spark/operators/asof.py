"""Scalable as-of (point-in-time) join.

The reference's point-in-time join (J3) leans on SCD2 intervals, where a
plain equi+range ``df.join`` suffices. This operator covers the general
case — "for each left row, the latest right row with the same key and
``right_ts <= left_ts``" — WITHOUT the naive range join (which Catalyst
would plan as a hash join with a residual filter over the full per-key
cross product: quadratic per key, deadly at 100 TB).

Strategy: the classic union + window trick. Tag both sides, union on
(key, ts), sort within key, and carry the last-seen right row forward with
``last(..., ignorenulls=True)``. Cost: ONE hash shuffle on the key and one
sort — linear, skew-handled by AQE, no per-key blowup, no join-back.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    left_ts: str,
    right_ts: str,
    right_prefix: str = "",
    tie_break: str | None = None,
    strict: bool = False,
    tolerance: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join, backward (default) or forward.

    Every ``left`` row is returned, augmented with the value columns of
    the matching ``right`` row — backward: the LATEST right with equal
    ``on`` keys and ``right_ts <= left_ts``; forward: the EARLIEST right
    with ``right_ts >= left_ts`` (strict flips ``<=``/``>=`` to strict
    inequality). NULLs when no match exists. Right value columns are
    prefixed ``right_prefix``.

    ``tie_break``: orders right rows with equal timestamps — backward the
    greatest value wins, forward the smallest (i.e. the row "nearest"
    past the boundary in scan order) — keeping results deterministic
    under duplicate timestamps.

    ``tolerance`` (e.g. ``"1 hour"``) bounds match staleness: a right row
    further than ``tolerance`` from ``left_ts`` (older for backward,
    newer for forward) is treated as no match (NULLs) —
    ``pd.merge_asof(tolerance=...)`` semantics. Implemented as a mask on
    the carried-forward row, so the plan is unchanged: still one shuffle,
    one window, no range join.

    Forward is the SAME union+window plan scanned in reverse: order the
    per-key window by ``ts`` descending (ties likewise reversed) and the
    "last seen right" becomes the next right at-or-after the left row —
    still one hash shuffle + one sort, no per-key blowup.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)
    lcols = left.columns
    rvals = [c for c in right.columns if c not in keys]

    # At equal ts a right row sorts before a left row for inclusive
    # semantics — the left row "sees" it; flipped when strict.
    r_side, l_side = (0, 1) if not strict else (1, 0)

    # a NULL right_ts satisfies neither <= nor >= any left_ts, so the
    # row can never match — and left unfiltered it would sort FIRST in
    # the ascending (backward) scan and be carried into left rows by
    # last(ignorenulls). The cogroup variant drops these rows too.
    # NULL join KEYS likewise: Window.partitionBy groups NULLs into one
    # partition, but the equi-join semantics this operator mirrors (and
    # every SQL oracle) never match NULL = NULL — drop NULL-key rights
    # so NULL-key left rows return unmatched instead of phantom-matched.
    null_key_guard = F.lit(True)
    for kcol in keys:
        null_key_guard = null_key_guard & F.col(kcol).isNotNull()
    rtagged = right.filter(null_key_guard & F.col(right_ts).isNotNull()).select(
        *keys,
        F.col(right_ts).alias("__ts"),
        F.lit(r_side).alias("__side"),
        (F.col(tie_break) if tie_break else F.lit(0)).alias("__tie"),
        F.struct(*[F.col(c) for c in rvals]).alias("__r"),
    ).withColumn("__l", F.lit(None).cast(f"struct<{','.join('`'+c+'`:'+left.schema[c].dataType.simpleString() for c in lcols)}>"))

    ltagged = left.select(
        *keys,
        F.col(left_ts).alias("__ts"),
        F.lit(l_side).alias("__side"),
        F.lit(None).cast(rtagged.schema["__tie"].dataType).alias("__tie"),
        F.lit(None).cast(rtagged.schema["__r"].dataType).alias("__r"),
        F.struct(*[F.col(c) for c in lcols]).alias("__l"),
    )

    if direction == "backward":
        order = [F.col("__ts").asc(), F.col("__side").asc(), F.col("__tie").asc()]
    else:
        # reverse scan: among equal-ts rights the LAST seen must be the
        # smallest tie value, so ties sort descending too
        order = [F.col("__ts").desc(), F.col("__side").asc(), F.col("__tie").desc()]
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    unioned = rtagged.unionByName(ltagged).withColumn("__last_r", F.last("__r", ignorenulls=True).over(w))
    if tolerance is not None:
        unioned = unioned.withColumn(
            "__last_ts",
            F.last(F.when(F.col("__r").isNotNull(), F.col("__ts")), ignorenulls=True).over(w),
        )
        in_range = (
            F.col("__last_ts") >= F.col("__ts") - F.expr(f"INTERVAL {tolerance}")
            if direction == "backward"
            else F.col("__last_ts") <= F.col("__ts") + F.expr(f"INTERVAL {tolerance}")
        )
        unioned = unioned.withColumn("__last_r", F.when(in_range, F.col("__last_r")))

    out = unioned.filter(F.col("__l").isNotNull()).select(
        *[F.col("__l").getField(c).alias(c) for c in lcols],
        *[F.col("__last_r").getField(c).alias(f"{right_prefix}{c}") for c in rvals],
    )
    return out


def as_of_join_cogroup(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_prefix: str = "",
    strict: bool = False,
) -> DataFrame:
    """Cogrouped-map alternative: ``left.groupBy(key).cogroup(
    right.groupBy(key)).applyInPandas(...)`` — Spark's native two-sided
    per-key pandas operator, which is the DOCUMENTED home for
    ``pd.merge_asof`` (no union/tag dance: each side arrives as its own
    frame). Same semantics as ``as_of_join_pandas``; kept as the
    cogroup-API exemplar and cross-check for the scalable union+window
    implementation. Scale bound: one shuffle per side on the key, then
    per-key pandas — each single key's rows must fit in memory; the
    union+window form remains the default.
    """
    lcols, rvals = left.columns, [c for c in right.columns if c != on]
    out_fields = [left.schema[c] for c in lcols] + [
        T.StructField(f"{right_prefix}{c}", right.schema[c].dataType) for c in rvals
    ]
    out_names = [f.name for f in out_fields]
    # right columns are renamed to their PREFIXED output names before the
    # merge — pd.merge_asof would otherwise suffix a name shared with the
    # left to v_x/v_y and the output selection would fail
    pref = {c: f"{right_prefix}{c}" for c in rvals}
    clash = set(lcols) & set(pref.values())
    if clash:
        raise ValueError(
            f"as_of_join_cogroup: output name collision {sorted(clash)} — set right_prefix"
        )
    schema = T.StructType(out_fields)
    pref_ts = pref[right_ts]

    def per_key(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        if lpdf.empty:
            return pd.DataFrame(columns=out_names)
        # merge_asof rejects NULL keys outright: NULL-ts rows on either
        # side are unmatched by contract (left keeps NULL right values,
        # right is ignored) — the union+window form makes the same call
        # for left rows; filter-then-concat keeps every left row
        lp = lpdf[lcols]
        l_ok, l_null = lp[lp[left_ts].notna()], lp[lp[left_ts].isna()]
        rp = rpdf[[on, *rvals]].rename(columns=pref)[list(pref.values())]
        rp = rp[rp[pref_ts].notna()]
        merged = pd.merge_asof(
            l_ok.sort_values(left_ts),
            rp.sort_values(pref_ts),
            left_on=left_ts,
            right_on=pref_ts,
            allow_exact_matches=not strict,
        )
        if not l_null.empty:
            merged = pd.concat([merged, l_null.reindex(columns=out_names)])
        return merged[out_names]

    return left.groupBy(on).cogroup(right.groupBy(on)).applyInPandas(per_key, schema=schema)


def as_of_join_pandas(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_prefix: str = "",
    strict: bool = False,
) -> DataFrame:
    """Grouped-map alternative: ``pd.merge_asof`` per key via
    ``applyInPandas`` (the pattern the Spark docs suggest for as-of).

    Same semantics as ``as_of_join`` for unique right timestamps (ties
    resolve by merge_asof's last-wins rule rather than an explicit
    tie-break column). Kept as (a) a cross-check oracle for the
    union+window implementation and (b) the template for per-group pandas
    logic that SQL can't express. Scale: one shuffle on the key, then
    per-group pandas — fine when single keys fit in memory; the
    union+window form has no such per-key bound and stays the default.
    """
    lcols, rvals = left.columns, [c for c in right.columns if c != on]
    clash = set(lcols) & {f"{right_prefix}{c}" for c in rvals}
    if clash:
        # same guard as as_of_join_cogroup: duplicate output field names
        # would otherwise surface later as AMBIGUOUS_REFERENCE downstream
        raise ValueError(
            f"as_of_join_pandas: output name collision {sorted(clash)} — set right_prefix"
        )
    out_fields = [left.schema[c] for c in lcols] + [
        T.StructField(f"{right_prefix}{c}", right.schema[c].dataType) for c in rvals
    ]
    schema = T.StructType(out_fields)
    tagged = left.select(F.lit(0).alias("__side"), *[F.col(c) for c in lcols]).unionByName(
        right.select(
            F.lit(1).alias("__side"),
            *[F.col(on)] ,
            *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c != on],
            *[F.col(c) for c in rvals],
        ),
        allowMissingColumns=True,
    )

    def per_key(pdf: pd.DataFrame) -> pd.DataFrame:
        lpdf = pdf[pdf["__side"] == 0][lcols].sort_values(left_ts)
        rpdf = pdf[pdf["__side"] == 1][[on, *rvals]].sort_values(right_ts)
        if lpdf.empty:
            return pd.DataFrame(columns=[f.name for f in out_fields])
        merged = pd.merge_asof(
            lpdf,
            rpdf.drop(columns=[on]),
            left_on=left_ts,
            right_on=right_ts,
            allow_exact_matches=not strict,
        )
        merged.columns = [f.name for f in out_fields]
        return merged

    return tagged.groupBy(on).applyInPandas(per_key, schema=schema)
