"""Property tests for the fifth contract batch — invariants the DuckDB
differential cannot express (probability normalization, sketch-vs-exact
tolerance, Pareto dominance)."""

from __future__ import annotations

from pyspark.sql import functions as F

from batch_data_pipeline_exercise_spark.plans import contract
from batch_data_pipeline_exercise_spark.plans import contract5  # noqa: F401 — registers queries


def test_markov_rows_are_distributions(spark, sf_dir):
    """Per-source transition probabilities sum to 1 (within fp dust) and
    transition counts equal total successor pairs."""
    out = contract.REGISTRY["event_type_markov"].fn(spark, sf_dir)
    sums = out.groupBy("src").agg(F.sum("prob").alias("p"), F.sum("transitions").alias("n")).collect()
    assert sums
    for r in sums:
        assert abs(r["p"] - 1.0) < 1e-9
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    n_events = events.count()
    n_users = events.select("user_id").distinct().count()
    assert sum(r["n"] for r in sums) == n_events - n_users  # one LEAD NULL per user


def test_kmv_estimates_vs_exact(spark, sf_dir):
    """KMV union/Jaccard estimates land within the standard ~1/sqrt(k)
    error band of the exact values."""
    out = {
        (r["event_type_a"], r["event_type_b"]): r
        for r in contract.REGISTRY["event_type_user_overlap_kmv"].fn(spark, sf_dir).collect()
    }
    assert out
    e = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("event_type", "user_id")
        .distinct()
        .collect()
    )
    sets: dict[str, set] = {}
    for r in e:
        sets.setdefault(r["event_type"], set()).add(r["user_id"])
    for (ta, tb), row in out.items():
        exact_union = len(sets[ta] | sets[tb])
        exact_j = len(sets[ta] & sets[tb]) / exact_union
        # k=64 → relative standard error ~ 1/sqrt(63) ≈ 12.6%; allow 4σ
        assert abs(row["union_distinct_est"] - exact_union) <= max(4 * exact_union / 7.9, 2.0)
        # se = sqrt(j(1-j)/k) <= 0.0625 at k=64 → 4σ = 0.25
        assert abs(row["jaccard_est"] - exact_j) <= 0.25
        assert 0 <= row["n_common"] <= row["k_used"] <= 64
        assert row["n_common"] + row["n_only_a"] + row["n_only_b"] == row["k_used"]
        exact_a_excl = len(sets[ta] - sets[tb])
        assert abs(row["excl_a_est"] - exact_a_excl) <= max(4 * exact_union / 7.9, 2.0)


def test_pareto_frontier_is_undominated(spark, sf_dir):
    """No frontier doc is strictly dominated by ANY doc in its language
    (higher-or-equal quality and shorter-or-equal length, one strict)."""
    from batch_data_pipeline_exercise_spark.operators import text
    from batch_data_pipeline_exercise_spark.plans.contract import load

    frontier = contract.REGISTRY["doc_pareto_frontier"].fn(spark, sf_dir).collect()
    assert frontier
    allq = (
        text.with_quality_score(load(spark, sf_dir, "documents"))
        .select("lang", F.length("text").alias("n"), "quality_score")
        .collect()
    )
    by_lang: dict[str, list] = {}
    for r in allq:
        by_lang.setdefault(r["lang"], []).append((r["quality_score"], r["n"]))
    for f in frontier:
        for q, n in by_lang[f["lang"]]:
            dominates = (
                q >= f["quality_score"]
                and n <= f["n_chars"]
                and (q > f["quality_score"] or n < f["n_chars"])
            )
            assert not dominates, f"{f} dominated by (q={q}, n={n})"


def test_token_drift_ranking_invariants(spark, sf_dir):
    """Drift = max(odds, 1/odds) >= 1, count floor held, and at most 3
    tokens per first-character shard."""
    rows = contract.REGISTRY["corpus_token_drift"].fn(spark, sf_dir).collect()
    assert rows
    shard_counts: dict[str, int] = {}
    for r in rows:
        assert r["ca"] + r["cb"] >= 5
        assert abs(r["drift"] - max(r["odds"], 1.0 / r["odds"])) == 0.0
        assert r["drift"] >= 1.0
        shard = r["token"][:1]
        shard_counts[shard] = shard_counts.get(shard, 0) + 1
    assert all(n <= 3 for n in shard_counts.values())


def test_bloom_contamination_equals_plain_join(spark, sf_dir):
    """The bloom-pruned contamination hits match the unpruned
    train_eval_contamination on the shared-gram counts."""
    bloomed = {
        r["doc_id"]: r["shared_grams"]
        for r in contract.REGISTRY["contamination_bloom_hits"].fn(spark, sf_dir).collect()
    }
    plain = {
        r["doc_id"]: r["shared_grams"]
        for r in contract.REGISTRY["train_eval_contamination"].fn(spark, sf_dir).collect()
        if r["shared_grams"] > 0
    }
    assert bloomed == plain


def test_lsh_occupancy_predicts_join_size(spark, sf_dir):
    """candidate_pairs summed over bands upper-bounds (and without
    cross-band dedup, predicts) the banded self-join's row count —
    the cost-model property the report exists to expose."""
    from batch_data_pipeline_exercise_spark.operators import dedup
    from batch_data_pipeline_exercise_spark.plans.contract import load

    occ = contract.REGISTRY["lsh_band_occupancy"].fn(spark, sf_dir).collect()
    assert len(occ) == 8
    predicted = sum(r["candidate_pairs"] for r in occ)
    d = load(spark, sf_dir, "documents")
    sig = dedup.minhash_signatures(dedup.word_shingles(d, "doc_id", distinct=False), k=32)
    bk = dedup.lsh_band_keys(sig, bands=8, rows=4)
    a = bk.select(F.col("id").alias("id1"), "band", "band_key")
    b = bk.select(F.col("id").alias("id2"), "band", "band_key")
    raw_pairs = a.join(b, ["band", "band_key"]).filter(F.col("id1") < F.col("id2")).count()
    distinct_pairs = (
        a.join(b, ["band", "band_key"])
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2")
        .distinct()
        .count()
    )
    assert raw_pairs == predicted
    assert distinct_pairs <= predicted


def test_chi2_margins_consistent(spark, sf_dir):
    """Row/column totals agree with the cell counts they summarize, and
    each contribution is non-negative with expected > 0."""
    rows = contract.REGISTRY["priority_status_chi2"].fn(spark, sf_dir).collect()
    assert rows
    n = sum(r["observed"] for r in rows)
    by_prio: dict[str, int] = {}
    by_status: dict[str, int] = {}
    for r in rows:
        by_prio[r["o_orderpriority"]] = by_prio.get(r["o_orderpriority"], 0) + r["observed"]
        by_status[r["o_orderstatus"]] = by_status.get(r["o_orderstatus"], 0) + r["observed"]
    for r in rows:
        assert r["row_total"] == by_prio[r["o_orderpriority"]]
        assert r["col_total"] == by_status[r["o_orderstatus"]]
        assert r["expected"] > 0
        assert r["chi2_contribution"] >= 0
        assert abs(r["expected"] - r["row_total"] * r["col_total"] / n) < 1e-9


def test_global_prefix_sum_matches_naive_window(spark, sf_dir):
    """The two-pass bucketed prefix sum equals the single-partition
    global window on the same total ordering — exactly, decimals and
    all — and the cumshare query's top-80 set is a prefix."""
    from pyspark.sql.window import Window as W

    from batch_data_pipeline_exercise_spark.operators.ranking import with_global_prefix_sum
    from batch_data_pipeline_exercise_spark.plans.contract import dec, load

    o = load(spark, sf_dir, "orders")
    pc = o.groupBy("o_custkey").agg(F.sum(dec("o_totalprice")).alias("rev"))
    keyed = pc.withColumn("__negrev", F.lit(0).cast("decimal(18,2)") - F.col("rev"))
    fast = {
        r["o_custkey"]: r["cum"]
        for r in with_global_prefix_sum(
            keyed, ["__negrev", "o_custkey"], "rev", out_col="cum", num_partitions=7
        ).collect()
    }
    naive_w = W.orderBy("__negrev", "o_custkey").rowsBetween(W.unboundedPreceding, W.currentRow)
    naive = {r["o_custkey"]: r["cum"] for r in keyed.withColumn("cum", F.sum("rev").over(naive_w)).collect()}
    assert fast == naive

    rows = contract.REGISTRY["customer_revenue_cumshare"].fn(spark, sf_dir).collect()
    by_share = sorted(rows, key=lambda r: r["cum_share"])
    flags = [r["in_top80"] for r in by_share]
    assert True in flags and flags == sorted(flags, reverse=True)  # top80 is a prefix
    assert abs(by_share[-1]["cum_share"] - 1.0) < 1e-9


def test_global_prefix_sum_string_lead_and_nulls(spark):
    """The repartitionByRange fallback (string leading order column) and
    NULL value semantics both match the naive global window exactly."""
    from pyspark.sql.window import Window as W

    from batch_data_pipeline_exercise_spark.operators.ranking import with_global_prefix_sum

    rows = [
        ("a", 1, None),
        ("b", 2, 10),
        ("c", 3, None),
        ("d", 4, 5),
        ("e", 5, None),
        ("f", 6, 7),
        ("g", 7, None),
        ("h", 8, 1),
    ]
    df = spark.createDataFrame(rows, "k string, id int, v int")
    fast = {
        r["k"]: r["cum"]
        for r in with_global_prefix_sum(df, ["k", "id"], "v", num_partitions=4).collect()
    }
    w = W.orderBy("k", "id").rowsBetween(W.unboundedPreceding, W.currentRow)
    naive = {r["k"]: r["cum"] for r in df.withColumn("cum", F.sum("v").over(w)).collect()}
    assert fast == naive
    assert naive["a"] is None and naive["c"] == 10  # the NULL-carry edge itself


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_prefix_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=50),  # lead order key (dup-heavy)
        st.one_of(st.none(), st.integers(min_value=-100, max_value=100)),  # value
    ),
    min_size=1,
    max_size=40,
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=_prefix_rows)
def test_global_prefix_sum_equals_window_randomized(spark, rows):
    """Randomized: bucketed prefix sums == the naive global window for
    arbitrary duplicate-heavy keys and NULL patterns, at several bucket
    counts (1 exercises the no-bounds path, 7 forces multi-bucket)."""
    from pyspark.sql.window import Window as W

    from batch_data_pipeline_exercise_spark.operators.ranking import with_global_prefix_sum

    data = [(k, i, v) for i, (k, v) in enumerate(rows)]
    df = spark.createDataFrame(data, "k int, id int, v int")
    w = W.orderBy("k", "id").rowsBetween(W.unboundedPreceding, W.currentRow)
    naive = {r["id"]: r["cum"] for r in df.withColumn("cum", F.sum("v").over(w)).collect()}
    for p in (1, 7):
        fast = {
            r["id"]: r["cum"]
            for r in with_global_prefix_sum(df, ["k", "id"], "v", num_partitions=p).collect()
        }
        assert fast == naive
