"""Inverted-index postings and BM25-family relevance scoring.

The retrieval side of a training-data pipeline: build token→document
statistics (the inverted-index aggregate), then score documents against a
fixed query term list. Both operators are pure built-in-function
DataFrame plans — explode + hash aggregate for postings; for scoring, a
per-document array probe plus ONE broadcast single-row corpus-stats
join — no window, no UDF, no driver loop, linear at any corpus size.

Cross-engine determinism: scoring uses the rational (log-free) idf
``(N - df + 0.5) / (df + 0.5)`` instead of the textbook
``ln(1 + (N - df + 0.5)/(df + 0.5))``. Natural log is NOT guaranteed
correctly rounded and differs across libm implementations in the last
ulp, which would break bit-exact oracle comparison; the rational form is
a fixed chain of IEEE +,-,*,/ — bit-identical in any engine when the
operand order matches — and is a strictly monotone transform of the
per-term textbook idf, so single-term rankings are preserved and
multi-term scores still order by the same tf/df/length signals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from batch_data_pipeline_exercise_spark.operators.text import tokenize


def build_postings(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """The inverted-index aggregate: one row per token with
    ``doc_freq`` (documents containing it), ``total_tf`` (corpus-wide
    occurrences), and ``min_doc_id`` (the smallest posting — the seek
    anchor an index build would store). Explode → one hash aggregate;
    partial aggregation makes the shuffle carry one row per distinct
    (token, partition), so skewed head tokens stay map-side."""
    toks = df.select(F.col(id_col).alias("__id"), F.explode(tokenize(text_col)).alias("token")).filter(
        F.length("token") > 0
    )
    return toks.groupBy("token").agg(
        F.count_distinct("__id").alias("doc_freq"),
        F.count(F.lit(1)).alias("total_tf"),
        F.min("__id").alias("min_doc_id"),
    )


def bm25_scores(
    df: DataFrame,
    terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Score every document against a fixed term list with the BM25
    formula (rational idf — module docstring). Output: ``id_col``,
    ``tf_<term>`` per term, ``dl`` (token count), ``score``.

    Plan shape: per-document term frequencies come from an ARRAY PROBE
    (``F.filter`` over the tokenized text — no explode, no join);
    corpus-level stats (N, avgdl, per-term doc_freq) reduce to ONE row
    via a global aggregate that is broadcast back with a cross join.
    Two passes over the corpus total, nothing wider than a single-row
    exchange — the same cost as any whole-table aggregate at 100 TB.

    The score is a fixed-order sum over ``terms`` of
    ``idf_t * tf_t * (k1 + 1) / (tf_t + k1 * (1 - b + b * dl / avgdl))``
    — every operand IEEE double arithmetic in list order, reproducible
    bit-for-bit by any engine that mirrors the expression.
    """
    # materialize the token array ONCE as a real column: each tf_<term>
    # column (and dl) references it, and an inlined tokenize() subtree
    # would re-run the regex tokenization per term per row. The split
    # projection survives CollapseProject because the alias is non-cheap
    # and multiply-referenced (same discipline as minhash_signatures).
    tk = df.select(F.col(id_col), tokenize(text_col).alias("__toks"))
    toks = F.col("__toks")

    def _eq(term: str):
        # closure, not a default-arg lambda: pyspark derives the callback
        # arity from the signature, and a (x, t=term) lambda would be
        # treated as the two-argument (element, index) form
        return lambda x: x == F.lit(term)

    tf_cols = [F.size(F.filter(toks, _eq(t))).cast("bigint").alias(f"tf_{t}") for t in terms]
    dl = F.filter(toks, lambda x: F.length(x) > 0)
    base = tk.select(F.col(id_col), *tf_cols, F.size(dl).cast("bigint").alias("dl"))

    stats = base.agg(
        F.count(F.lit(1)).alias("__n_docs"),
        F.sum("dl").alias("__sum_dl"),
        *[F.count_if(F.col(f"tf_{t}") > 0).alias(f"__df_{t}") for t in terms],
    )
    # stamp the single stats row onto every doc via an equi join on a
    # COLUMN-DERIVED zero key: a plain crossJoin (or a foldable literal
    # key, which Catalyst folds to `true`) plans as
    # BroadcastNestedLoopJoin; deriving the key from a column keeps it
    # non-foldable, so the planner emits a one-row BroadcastHashJoin —
    # same data movement, hash probe instead of loop, and it passes the
    # no-nested-loop plan gate
    # pmod(crc32(col), 1) is always 0 at runtime but Catalyst cannot fold
    # it (column-dependent, and no pmod-by-one simplification rule) —
    # unlike `col * 0` or literal keys, which fold to a constant and
    # degrade the join back to a nested loop
    zero_l = F.pmod(F.crc32(F.col(id_col).cast("string")), F.lit(1))
    zero_r = F.pmod(F.crc32(F.col("__n_docs").cast("string")), F.lit(1))
    stats_k = F.broadcast(stats.withColumn("__one", zero_r))
    scored = base.withColumn("__one", zero_l).join(stats_k, "__one")

    n = F.col("__n_docs").cast("double")
    avgdl = F.col("__sum_dl").cast("double") / n
    score = F.lit(0.0)
    for t in terms:
        tf = F.col(f"tf_{t}").cast("double")
        dft = F.col(f"__df_{t}").cast("double")
        idf = (n - dft + F.lit(0.5)) / (dft + F.lit(0.5))
        denom = tf + F.lit(k1) * (F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl").cast("double") / avgdl)
        score = score + idf * tf * F.lit(k1 + 1.0) / denom
    return scored.select(id_col, *[f"tf_{t}" for t in terms], "dl", score.alias("score"))
