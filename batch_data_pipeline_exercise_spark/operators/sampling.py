"""Deterministic sampling / splitting / packing for training-data pipelines.

Every operator here is content-addressed — sampling decisions derive from
a hash of a stable key column, never from ``rand()`` — so results are
reproducible across runs, clusters, retries, AND engines (md5 + integer
arithmetic, replicated exactly by the SQL oracles). That determinism is
the property a 100 TB training-data pipeline actually needs: re-running a
split after adding documents never reshuffles the old ones between train
and validation.

All ops are narrow column expressions or single partitioned windows — no
global sorts, no driver-side data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def hash_uniform(key: Column, seed: str = "") -> Column:
    """Deterministic uniform double in [0, 1) from a key: the md5 digest's
    first 32-bit word divided by 2³². Seed changes produce an independent
    assignment (the seed is mixed into the hashed bytes).

    A NULL key yields NULL (not some shared hash of the seed) — so NULL
    keys are dropped by ``deterministic_sample``, take the last split in
    ``with_hash_split``, and sort last in ``stratified_sample_topk``,
    identically in Spark and the SQL oracles (SQL ``||`` propagates NULL;
    ``concat_ws`` alone would silently skip it)."""
    h = F.md5(F.concat_ws("§", F.lit(seed), key.cast("string")))
    u = F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") / F.lit(2 ** 32)
    return F.when(key.isNull(), F.lit(None).cast("double")).otherwise(u)


def with_hash_split(
    df: DataFrame,
    key_col: str,
    weights: dict[str, float],
    seed: str = "",
    out_col: str = "split",
) -> DataFrame:
    """Assign every row to a named split (e.g. train/val/test) by its
    key's hash — stable under data growth: a row's split never changes
    when other rows appear or the table is re-partitioned.

    ``weights`` are relative (normalized internally); assignment walks the
    cumulative distribution in dict order.
    """
    total = float(sum(weights.values()))
    u = hash_uniform(F.col(key_col), seed)
    expr: Column | None = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name] / total
        expr = F.when(u < acc, name) if expr is None else expr.when(u < acc, name)
    last = F.lit(names[-1])
    return df.withColumn(out_col, last if expr is None else expr.otherwise(last))


def deterministic_sample(df: DataFrame, key_col: str, fraction: float, seed: str = "") -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by key hash — the reproducible
    replacement for ``df.sample`` (whose output depends on partition
    layout). A row is kept or dropped identically in every run and
    engine."""
    return df.filter(hash_uniform(F.col(key_col), seed) < fraction)


def stratified_sample_topk(
    df: DataFrame,
    strata_cols: list[str],
    key_col: str,
    k: int,
    seed: str = "",
) -> DataFrame:
    """EXACTLY ``k`` rows per stratum (fewer when the stratum is smaller):
    the k smallest key-hashes win. Unlike fraction-based stratified
    sampling this gives fixed per-group quotas — the class-balancing
    shape — while staying deterministic. One partitioned window, ordered
    by the hash with the key as tiebreaker."""
    u = hash_uniform(F.col(key_col), seed).alias("__u")
    # nulls LAST to agree with SQL engines' default ORDER BY (Spark's
    # default is nulls-first) — NULL-key rows only win quota leftovers
    w = Window.partitionBy(*strata_cols).orderBy(
        F.col("__u").asc_nulls_last(), F.col(key_col).asc_nulls_last()
    )
    return (
        df.withColumn("__u", u)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__u", "__rn")
    )


def assign_packing_bins(
    df: DataFrame,
    size_col: str,
    budget: int,
    order_cols: list[str],
    partition_cols: list[str] | None = None,
    out_col: str = "bin",
) -> DataFrame:
    """Concat-then-chunk sequence packing (the LM-training shape): lay the
    rows out in ``order_cols`` order, accumulate ``size_col`` (token
    counts), and cut a new bin every ``budget`` units —
    ``bin = (running_sum - size) div budget``. A document longer than the
    budget still gets one bin (it would be internally chunked by the
    tokenizer downstream).

    ``partition_cols`` scopes the packing (e.g. per language-shard), which
    also keeps the window partitioned — global packing of a 100 TB corpus
    should shard first; an unpartitioned call raises.
    """
    if not partition_cols:
        raise ValueError(
            "assign_packing_bins needs partition_cols: unpartitioned packing is a "
            "single-task global sort at scale — shard the corpus first (e.g. by "
            "hash prefix or language)"
        )
    w = (
        Window.partitionBy(*partition_cols)
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = F.sum(size_col).over(w)
    return df.withColumn(out_col, F.floor((run - F.col(size_col)) / F.lit(budget)).cast("bigint"))


def weighted_priority_sample(
    df: DataFrame,
    strata_cols: list[str],
    key_col: str,
    weight_col: str,
    k: int,
    seed: str = "",
    priority_col: str | None = None,
) -> DataFrame:
    """Sequential Poisson (pps) sampling: EXACTLY ``k`` rows per stratum,
    inclusion probability proportional to ``weight_col`` — Ohlsson's
    order-sampling scheme (rank each row by ξ = u/w for uniform u, keep
    the k smallest), the standard fixed-size probability-proportional-
    to-size design. In an LLM pipeline: sample documents ∝ length/score
    with a hard per-stratum quota.

    Determinism: u is the key's 33-bit odd hash numerator, and
    ξ = (2h+1) / (2³⁴·w) — the numerator and denominator are EXACT
    bigints (w must be a positive integer ≤ ~2²⁸), so ξ is ONE IEEE
    double division, bit-identical in every engine; ordering ties break
    on the key. Same shape as ``stratified_sample_topk``: one
    partitioned ranking window, no global sort.
    """
    # NULL-key guard mirrors hash_uniform: SQL `||` propagates NULL while
    # concat_ws silently skips it — without the when(), NULL-key rows
    # would share one seed-only hash, compete for quota, and diverge
    # from the ||-based oracle (which ranks them last via xi = NULL)
    h_raw = F.conv(
        F.substring(F.md5(F.concat_ws("§", F.lit(seed), F.col(key_col).cast("string"))), 1, 8), 16, 10
    ).cast("bigint")
    h = F.when(F.col(key_col).isNull(), F.lit(None).cast("bigint")).otherwise(h_raw)
    xi = (h * 2 + 1) / (F.col(weight_col).cast("bigint") * F.lit(2 ** 34))
    w = Window.partitionBy(*strata_cols).orderBy(
        F.col("__xi").asc_nulls_last(), F.col(key_col).asc_nulls_last()
    )
    out = (
        df.withColumn("__xi", xi)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )
    if priority_col:
        return out.withColumnRenamed("__xi", priority_col)
    return out.drop("__xi")


def token_budget_sample(
    df: DataFrame,
    group_cols: list[str],
    size_col: str,
    budget: int,
    key_col: str,
    seed: str = "",
    cum_col: str | None = None,
) -> DataFrame:
    """Greedy per-group token-budget selection: walk each group's rows in
    hash order (an unbiased, reproducible shuffle) and keep rows while
    the budget lasts — the "give every source at most B tokens" mixture
    primitive, dual of ``temperature_mixture_sample`` (rates) and
    ``weighted_priority_sample`` (quotas by count).

    A row is kept iff the running ``size_col`` total BEFORE it is below
    ``budget`` — so selection is a pure integer cumulative-sum
    comparison (exact everywhere), the first row of an over-budget group
    is still kept (a document longer than the budget yields that one
    document, not zero), and total kept size < budget + max_row_size.
    One partitioned window ordered by (hash, key); no global state.
    """
    u = hash_uniform(F.col(key_col), seed)
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(F.col("__u").asc_nulls_last(), F.col(key_col).asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = F.sum(F.col(size_col).cast("bigint")).over(w)
    out = (
        df.withColumn("__u", u)
        .withColumn("__cum", run)
        .filter(F.col("__cum") - F.col(size_col) < budget)
        .drop("__u")
    )
    if cum_col:
        return out.withColumnRenamed("__cum", cum_col)
    return out.drop("__cum")


def temperature_mixture_sample(
    df: DataFrame,
    group_cols: list[str],
    key_col: str,
    seed: str = "",
    rate_col: str | None = None,
) -> DataFrame:
    """Temperature-α=0.5 mixture rebalancing (the multilingual-pretraining
    staple: sample group g ∝ n_g^α, flattening the corpus distribution
    toward uniform): per-group keep-rate r_g = sqrt(n_min / n_g), so the
    SMALLEST group keeps everything and a group 100× larger keeps 10% —
    realized per-row as ``hash_uniform(key) < r_g``, deterministic and
    stable under re-runs like every sampler here.

    α is fixed at 0.5 because the rate must be BIT-IDENTICAL across
    engines for the differential oracle: ``sqrt`` is IEEE
    correctly-rounded everywhere, ``pow`` is not (libm-dependent last
    ulp, which could flip a row's membership at the u == r boundary).

    Plan shape: one count aggregate over group_cols (tiny result),
    broadcast back, then a narrow filter — no window, no second shuffle
    of the data. ``rate_col`` optionally exposes r_g in the output.
    """
    counts = df.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("__ng")).localCheckpoint()
    # bounded metadata action (one scalar off a materialized aggregate —
    # the ranking.py pattern), NOT a 1-row join: Catalyst rewrites any
    # single-row join (crossJoin or constant-key equi) into
    # BroadcastNestedLoopJoin, which the plan gate rejects everywhere
    n_min = counts.agg(F.min("__ng")).first()[0]
    rates = counts.select(
        *group_cols, F.sqrt(F.lit(n_min).cast("double") / F.col("__ng")).alias("__rate")
    )
    out = df.join(F.broadcast(rates), group_cols).filter(
        hash_uniform(F.col(key_col), seed) < F.col("__rate")
    )
    if rate_col:
        return out.withColumnRenamed("__rate", rate_col)
    return out.drop("__rate")
