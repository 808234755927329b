"""Round-6 breadth: exact allocation, sweep-line concurrency, chunk-dedup
text rebuild, and per-doc boilerplate coverage.

Registered AFTER contract5 (import order in ``__spark_entry__``) so the
evidence router keeps the still-unverified round-5 queries ahead of
these in the driver's CORRECTNESS window.

Same cross-engine determinism discipline as the rest of the registry
(contract.py header): integer/decimal arithmetic in the decision path,
one double division per output row at most, md5 for text digests,
aliases identical on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from batch_data_pipeline_exercise_spark.operators.ranking import with_global_prefix_sum
from batch_data_pipeline_exercise_spark.operators.text import norm_ws_sql
from batch_data_pipeline_exercise_spark.plans.contract import dec, load, register

_NORM6 = norm_ws_sql("text")


# ---------------------------------------------------------------------------
# Exact largest-remainder allocation (finance-grade proration)
# ---------------------------------------------------------------------------


@register(
    "order_penny_allocation",
    oracle="""
    WITH li AS (
      SELECT l_orderkey, l_linenumber,
             CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS w
      FROM lineitem
    ), o AS (
      SELECT o_orderkey,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS total_cents
      FROM orders
    ), j AS (
      SELECT l.l_orderkey, l.l_linenumber, l.w, o.total_cents,
             SUM(l.w) OVER (PARTITION BY l.l_orderkey) AS big_w
      FROM li l JOIN o ON l.l_orderkey = o.o_orderkey
    ), b AS (
      SELECT *, (total_cents * w) // big_w AS base,
             (total_cents * w) % big_w AS rem
      FROM j
    ), r AS (
      SELECT *,
             ROW_NUMBER() OVER (PARTITION BY l_orderkey
                                ORDER BY rem DESC, l_linenumber) AS rk,
             total_cents - SUM(base) OVER (PARTITION BY l_orderkey) AS leftover
      FROM b
    )
    SELECT l_orderkey, l_linenumber,
           CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT)
             AS alloc_cents
    FROM r
    """,
    doc="Largest-remainder (Hamilton) proration: distribute each order's "
    "total price across its line items proportionally to extended price, "
    "in whole cents, such that the per-order cent sum is EXACTLY the "
    "order total — the invoice/revenue-recognition allocation every "
    "finance pipeline needs. Pure int64 arithmetic (cents via decimal "
    "cast, floor-div base shares, +1 cent to the largest remainders, "
    "line-number tiebreak), so cross-engine bit-exact with zero floats. "
    "Plan: one equi join + two partitioned windows; headroom: "
    "total_cents*w peaks ~5e14 << int64.",
    bench=True,
)
def order_penny_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        (dec("l_extendedprice") * 100).cast("bigint").alias("w"),
    )
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", (dec("o_totalprice") * 100).cast("bigint").alias("total_cents")
    )
    wo = Window.partitionBy("l_orderkey")
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .withColumn("big_w", F.sum("w").over(wo))
        .withColumn("base", F.expr("(total_cents * w) div big_w"))
        .withColumn("rem", (F.col("total_cents") * F.col("w")) % F.col("big_w"))
    )
    wr = Window.partitionBy("l_orderkey").orderBy(F.col("rem").desc(), "l_linenumber")
    return (
        j.withColumn("rk", F.row_number().over(wr))
        .withColumn("leftover", F.col("total_cents") - F.sum("base").over(wo))
        .select(
            "l_orderkey",
            "l_linenumber",
            (F.col("base") + F.when(F.col("rk") <= F.col("leftover"), 1).otherwise(0))
            .cast("bigint")
            .alias("alloc_cents"),
        )
    )


# ---------------------------------------------------------------------------
# Sweep-line concurrency over derived sessions
# ---------------------------------------------------------------------------


@register(
    "peak_concurrent_sessions",
    oracle="""
    WITH e AS (
      SELECT user_id, ts, event_id,
             CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       IS NULL
                  OR ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_session
      FROM events WHERE user_id IS NOT NULL
    ), s AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM e
    ), sess AS (
      SELECT user_id, session_id, MIN(ts) AS start_ts,
             MAX(ts) + INTERVAL 30 MINUTE AS end_ts
      FROM s GROUP BY user_id, session_id
    ), deltas AS (
      SELECT start_ts AS ts, 1 AS delta, user_id, session_id FROM sess
      UNION ALL
      SELECT end_ts AS ts, -1 AS delta, user_id, session_id FROM sess
    ), cum AS (
      SELECT ts, SUM(delta) OVER (ORDER BY ts, delta, user_id, session_id
                                  ROWS UNBOUNDED PRECEDING) AS conc
      FROM deltas
    )
    SELECT CAST(ts AS DATE) AS day, CAST(MAX(conc) AS BIGINT) AS peak_concurrent
    FROM cum GROUP BY CAST(ts AS DATE)
    """,
    doc="Peak concurrent sessions per day by sweep line: derive 30-min-gap "
    "sessions (same fold as user_sessions), extend each to last-event + "
    "30 min (the timeout a live session holds resources for), emit "
    "+1/-1 boundary deltas, and take the global running sum — computed "
    "with the distributed two-pass prefix-sum operator, NOT an "
    "unpartitioned window (the per-bucket offsets cross the driver as "
    "one row each). -1 sorts before +1 at equal timestamps, making "
    "intervals half-open — an expiring and a starting session at the "
    "same instant never double-count. The capacity-planning query for "
    "anything session-bound (connection pools, GPU slots, seats).",
)
def peak_concurrent_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    flagged = e.withColumn("prev_ts", F.lag("ts").over(w)).withColumn(
        "new_session",
        F.when(
            F.col("prev_ts").isNull()
            | (F.expr("timestampdiff(MICROSECOND, prev_ts, ts)") > 30 * 60 * 1_000_000),
            1,
        ).otherwise(0),
    )
    sess = (
        flagged.withColumn("session_id", F.sum("new_session").over(wrun))
        .groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("start_ts"),
            (F.max("ts") + F.expr("INTERVAL 30 MINUTES")).alias("end_ts"),
        )
    )
    deltas = sess.select(
        F.col("start_ts").alias("ts"), F.lit(1).alias("delta"), "user_id", "session_id"
    ).unionByName(
        sess.select(
            F.col("end_ts").alias("ts"), F.lit(-1).alias("delta"), "user_id", "session_id"
        )
    )
    # bucket/order on an integer epoch key: the prefix-sum's quantile
    # bucketing can't sample TIMESTAMP_NTZ, and µs-since-epoch orders
    # identically to the timestamp itself
    deltas = deltas.withColumn(
        "ts_us", F.expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")
    )
    cum = with_global_prefix_sum(
        deltas,
        order_cols=["ts_us", "delta", "user_id", "session_id"],
        value_col="delta",
        out_col="conc",
    )
    return cum.groupBy(F.to_date("ts").alias("day")).agg(
        F.max("conc").cast("bigint").alias("peak_concurrent")
    )


# ---------------------------------------------------------------------------
# Chunk-dedup with order-preserving text rebuild
# ---------------------------------------------------------------------------


@register(
    "doc_chunk_dedup_rebuild",
    oracle=f"""
    WITH toks AS (SELECT doc_id, string_split({_NORM6}, ' ') AS tk FROM documents
                  WHERE COALESCE(length(trim(text)), 0) > 0),
    ch AS (
      SELECT doc_id, CAST(u.s / 64 AS INTEGER) AS chunk_id,
             array_to_string(list_slice(tk, u.s + 1, u.s + 64), ' ') AS chunk_text
      FROM toks, UNNEST(range(0, greatest(len(tk) - 1, 0) + 1, 64)) AS u(s)
    ), keyed AS (
      SELECT doc_id, chunk_id, chunk_text, md5(chunk_text) AS k,
             doc_id * 1000000 + chunk_id AS enc
      FROM ch
    ), firsts AS (SELECT k, MIN(enc) AS keep_enc FROM keyed GROUP BY k),
    kept AS (
      SELECT keyed.* FROM keyed JOIN firsts ON keyed.k = firsts.k
      WHERE keyed.enc = firsts.keep_enc
    ), totals AS (SELECT doc_id, COUNT(*) AS total_chunks FROM keyed GROUP BY doc_id),
    rebuilt AS (
      SELECT doc_id, COUNT(*) AS kept_chunks,
             string_agg(chunk_text, ' ' ORDER BY chunk_id) AS txt
      FROM kept GROUP BY doc_id
    )
    SELECT t.doc_id, t.total_chunks,
           CAST(COALESCE(r.kept_chunks, 0) AS BIGINT) AS kept_chunks,
           md5(COALESCE(r.txt, '')) AS rebuilt_md5
    FROM totals t LEFT JOIN rebuilt r ON t.doc_id = r.doc_id
    """,
    doc="Cross-document chunk dedup with ORDER-PRESERVING rebuild: 64-token "
    "chunks, each content hash keeps only its globally-first occurrence "
    "(min doc*1e6+chunk encoding — one MIN, no distributed argmin), and "
    "every document is reassembled from its surviving chunks in original "
    "chunk order. This is the actual WRITE path of sub-document dedup — "
    "chunk_dedup_exact reports the duplicates, this produces the cleaned "
    "corpus. Output digests (md5) rather than full rebuilt text so the "
    "compare stays narrow. Linear: explode, hash groupBy, join back, "
    "one partitioned re-agg; the rebuild's sort_array is per-doc (bounded "
    "by doc length), never a global sort.",
)
def doc_chunk_dedup_rebuild(spark: SparkSession, sf_dir: str) -> DataFrame:
    from batch_data_pipeline_exercise_spark.operators.text import chunk_documents

    d = load(spark, sf_dir, "documents")
    ch = chunk_documents(d, "doc_id", chunk_tokens=64, overlap=0).select(
        "doc_id",
        "chunk_id",
        "chunk_text",
        F.md5("chunk_text").alias("k"),
        (F.col("doc_id") * 1000000 + F.col("chunk_id")).alias("enc"),
    )
    firsts = ch.groupBy("k").agg(F.min("enc").alias("keep_enc"))
    kept = ch.join(firsts, "k").filter(F.col("enc") == F.col("keep_enc"))
    totals = ch.groupBy("doc_id").agg(F.count(F.lit(1)).alias("total_chunks"))
    rebuilt = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("kept_chunks"),
        F.concat_ws(
            " ",
            F.transform(
                F.sort_array(F.collect_list(F.struct("chunk_id", "chunk_text"))),
                lambda s: s["chunk_text"],
            ),
        ).alias("txt"),
    )
    return totals.join(rebuilt, "doc_id", "left").select(
        "doc_id",
        "total_chunks",
        F.coalesce("kept_chunks", F.lit(0)).cast("bigint").alias("kept_chunks"),
        F.md5(F.coalesce("txt", F.lit(""))).alias("rebuilt_md5"),
    )


# ---------------------------------------------------------------------------
# Per-document boilerplate coverage
# ---------------------------------------------------------------------------


@register(
    "doc_boilerplate_coverage",
    oracle=f"""
    WITH toks AS (SELECT doc_id, string_split({_NORM6}, ' ') AS tk FROM documents),
    pos AS (
      SELECT doc_id, u.s AS gram
      FROM toks, UNNEST(list_transform(range(0, greatest(len(tk)-8, 0)+1),
                  i -> array_to_string(list_slice(tk, i+1, i+8), ' '))) AS u(s)
      WHERE length(u.s) > 0
    ), boiler AS (
      SELECT gram FROM (SELECT DISTINCT doc_id, gram FROM pos)
      GROUP BY gram HAVING COUNT(*) >= 3
    )
    SELECT p.doc_id, COUNT(*) AS n_grams,
           CAST(SUM(CASE WHEN b.gram IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_boiler,
           CAST(SUM(CASE WHEN b.gram IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*) AS boiler_frac
    FROM pos p LEFT JOIN boiler b ON p.gram = b.gram
    GROUP BY p.doc_id
    """,
    doc="Per-document boilerplate coverage: the fraction of a doc's "
    "positional word-8-grams that are corpus boilerplate (gram in 3+ "
    "distinct docs — the same mining rule as corpus_boilerplate_ngrams, "
    "which lists the grams; this scores the DOCS, the filter stage that "
    "actually drops template-dominated pages). Exact integer counts + "
    "one double division. Plan: positional explode, per-doc-distinct "
    "groupBy for the boiler set, one equi join back — all linear, no "
    "windows.",
)
def doc_boilerplate_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from batch_data_pipeline_exercise_spark.operators.dedup import word_shingles

    d = load(spark, sf_dir, "documents")
    # word_shingles emits (id, shingle)
    pos = word_shingles(d, "doc_id", n=8, distinct=False).select(
        F.col("id").alias("doc_id"), F.col("shingle").alias("gram")
    )
    boiler = (
        pos.select("doc_id", "gram")
        .distinct()
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= 3)
        .select("gram", F.lit(True).alias("is_boiler"))
    )
    n_boiler = F.sum(F.when(F.col("is_boiler"), 1).otherwise(0))
    return (
        pos.join(boiler, "gram", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            n_boiler.cast("bigint").alias("n_boiler"),
            (n_boiler.cast("double") / F.count(F.lit(1))).alias("boiler_frac"),
        )
    )


# ---------------------------------------------------------------------------
# Benford first-digit audit
# ---------------------------------------------------------------------------

#: log10(1 + 1/d) as exact double literals — Benford's law expected
#: proportions, precomputed so NO transcendental runs in either engine
#: (libm log implementations differ in the last ulp across engines)
_BENFORD = {
    1: 0.3010299956639812,
    2: 0.17609125905568124,
    3: 0.12493873660829993,
    4: 0.09691001300805642,
    5: 0.07918124604762482,
    6: 0.06694678963061322,
    7: 0.05799194697768673,
    8: 0.05115252244738129,
    9: 0.04575749056067514,
}
#: VARCHAR-bridged literals: DuckDB parses a bare 17-digit literal as
#: DECIMAL(17,17) and its decimal→double conversion is off by one ulp
#: (scaled-int / 1e17 in double arithmetic); string→double parsing is
#: correctly rounded in both engines (SCALE.md round-5 rule)
_BENFORD_SQL = "CASE first_digit " + " ".join(
    f"WHEN {d} THEN CAST('{p!r}' AS DOUBLE)" for d, p in _BENFORD.items()
) + " END"


@register(
    "order_amount_benford_audit",
    oracle=f"""
    WITH d AS (
      SELECT substr(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                         AS VARCHAR), 1, 1) AS fd
      FROM orders WHERE o_totalprice > 0
    ), c AS (
      SELECT CAST(fd AS INTEGER) AS first_digit, COUNT(*) AS n
      FROM d GROUP BY fd
    ), t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM c)
    SELECT c.first_digit, c.n,
           CAST(c.n AS DOUBLE) / CAST(t.total AS DOUBLE) AS observed_frac,
           {_BENFORD_SQL} AS expected_frac,
           CAST(c.n AS DOUBLE) / CAST(t.total AS DOUBLE)
             - {_BENFORD_SQL} AS deviation
    FROM c CROSS JOIN t
    """,
    doc="Benford first-digit audit over order totals — the classic "
    "fabricated-data / ingestion-corruption screen (a feed that "
    "duplicates, truncates, or fills defaults skews the leading-digit "
    "distribution long before totals look wrong). First digit extracted "
    "from the exact integer cents (no float formatting), expected "
    "proportions are PRECOMPUTED log10 literals so no transcendental "
    "runs in either engine, observed fractions are exact-count "
    "divisions. Plan: one scan, one 9-group aggregate, one broadcast "
    "of the 1-row total.",
)
def order_amount_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    cents = (dec("o_totalprice") * 100).cast("bigint")
    c = (
        o.select(F.substring(cents.cast("string"), 1, 1).cast("int").alias("first_digit"))
        .groupBy("first_digit")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # zero-key broadcast stamp for the 1-row total, not a cross join —
    # a crossJoin plans as BroadcastNestedLoopJoin, which the
    # plan-quality gate (rightly) forbids outside the quadratic allowlist
    from batch_data_pipeline_exercise_spark.plans.contract3 import _stamp_global

    t = c.agg(F.sum("n").cast("bigint").alias("total"))
    expected = F.element_at(
        F.create_map(*[F.lit(x) for d, p in _BENFORD.items() for x in (d, p)]),
        F.col("first_digit"),
    )
    return _stamp_global(c, "first_digit", t, "total").select(
        "first_digit",
        "n",
        (F.col("n").cast("double") / F.col("total")).alias("observed_frac"),
        expected.alias("expected_frac"),
        (F.col("n").cast("double") / F.col("total") - expected).alias("deviation"),
    )


# ---------------------------------------------------------------------------
# Share-of-parent hierarchy rollup
# ---------------------------------------------------------------------------


@register(
    "nation_share_of_region_revenue",
    oracle="""
    WITH rev AS (
      SELECT n.n_name AS nation, r.r_name AS region,
             SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                 * (CAST(1 AS DECIMAL(4,2)) - CAST(l.l_discount AS DECIMAL(4,2))))
               AS nation_rev
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
      JOIN region r   ON n.n_regionkey = r.r_regionkey
      GROUP BY n.n_name, r.r_name
    ), reg AS (
      SELECT region, SUM(nation_rev) AS region_rev FROM rev GROUP BY region
    )
    SELECT rev.region, rev.nation,
           CAST(rev.nation_rev AS DOUBLE) AS nation_revenue,
           CAST(reg.region_rev AS DOUBLE) AS region_revenue,
           CAST(rev.nation_rev AS DOUBLE) / CAST(reg.region_rev AS DOUBLE)
             AS share_of_region
    FROM rev JOIN reg ON reg.region = rev.region
    """,
    doc="Share-of-parent at two hierarchy levels: nation revenue as a "
    "fraction of its region's — the percent-of-parent drill every BI "
    "hierarchy needs (revenue_rollup gives the level TOTALS; this gives "
    "each child's share). Exact decimal sums at both levels, region "
    "totals re-aggregated FROM the nation decimals (never a second "
    "double sum), one double division per row. Plan: fact-dim broadcast "
    "joins, nation-grain aggregate, tiny region re-aggregate joined "
    "back broadcast.",
)
def nation_share_of_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    rev = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(n.n_name.alias("nation"), r.r_name.alias("region"))
        .agg(
            F.sum(
                dec("l_extendedprice")
                * (F.lit(1).cast("decimal(4,2)") - dec("l_discount", 4, 2))
            ).alias("nation_rev")
        )
    )
    reg = rev.groupBy("region").agg(F.sum("nation_rev").alias("region_rev"))
    return rev.join(F.broadcast(reg), "region").select(
        "region",
        "nation",
        F.col("nation_rev").cast("double").alias("nation_revenue"),
        F.col("region_rev").cast("double").alias("region_revenue"),
        # one double division over the SAME doubles both engines display
        # — never a re-rounded decimal on one side only
        (F.col("nation_rev").cast("double") / F.col("region_rev").cast("double")).alias(
            "share_of_region"
        ),
    )
