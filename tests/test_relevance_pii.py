"""PII detection/redaction, repetition stats, postings + BM25 scoring."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from batch_data_pipeline_exercise_spark.operators.relevance import bm25_scores, build_postings
from batch_data_pipeline_exercise_spark.operators.text import (
    redact_pii,
    with_pii_counts,
    with_repetition_stats,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


# ---------------------------------------------------------------------------
# PII
# ---------------------------------------------------------------------------


def test_pii_counts_and_redaction(spark):
    d = _docs(
        spark,
        [
            (1, "mail me at alice.smith+x@example.co.uk thanks"),
            (2, "server at 192.168.1.10 and fallback 10.0.0.1"),
            (3, "call +1 (555) 123-4567 now"),
            (4, "clean document with no contact surface"),
            (5, "bob@x.io or 8.8.8.8 or 555 867 5309"),
        ],
    )
    out = {r["doc_id"]: r for r in with_pii_counts(d).collect()}
    assert (out[1]["n_emails"], out[1]["n_phones"], out[1]["n_ipv4"]) == (1, 0, 0)
    assert (out[2]["n_emails"], out[2]["n_phones"], out[2]["n_ipv4"]) == (0, 0, 2)
    assert (out[3]["n_emails"], out[3]["n_phones"], out[3]["n_ipv4"]) == (0, 1, 0)
    assert not out[4]["has_pii"]
    assert out[5]["n_emails"] == 1 and out[5]["n_ipv4"] == 1 and out[5]["n_phones"] == 1

    red = {r["doc_id"]: r["text_redacted"] for r in redact_pii(d).collect()}
    assert red[1] == "mail me at <EMAIL> thanks"
    assert red[2] == "server at <IP> and fallback <IP>"
    assert red[3] == "call <PHONE> now"
    assert red[4] == "clean document with no contact surface"
    assert "<EMAIL>" in red[5] and "<IP>" in red[5] and "<PHONE>" in red[5]


def test_pii_ipv4_not_claimed_by_phone(spark):
    # dots break the phone interior class, so the IP must redact as <IP>
    # even though phone runs last over already-redacted text
    d = _docs(spark, [(1, "ip 10.20.30.40 phone 555 123 9876")])
    red = redact_pii(d).collect()[0]["text_redacted"]
    assert red == "ip <IP> phone <PHONE>"


# ---------------------------------------------------------------------------
# repetition stats
# ---------------------------------------------------------------------------


def test_repetition_stats_boilerplate_vs_clean(spark):
    d = _docs(
        spark,
        [
            (1, "buy now buy now buy now buy now"),  # 8 toks, 7 bigrams, 2 distinct
            (2, "the quick brown fox jumps over lazy dogs"),  # all distinct
            (3, "one"),  # too short for bigrams
        ],
    )
    out = {r["doc_id"]: r for r in with_repetition_stats(d, "doc_id", n=2).collect()}
    assert out[1]["n_ngrams"] == 7 and out[1]["distinct_ngrams"] == 2
    assert out[1]["top_ngram"] == "buy now"  # count 4 vs "now buy" count 3
    assert math.isclose(out[1]["top_ngram_share"], 4 / 7)
    assert math.isclose(out[1]["dup_ngram_frac"], 1 - 2 / 7)
    assert out[2]["n_ngrams"] == 7 and out[2]["distinct_ngrams"] == 7
    assert out[2]["dup_ngram_frac"] == 0.0
    assert out[3]["n_ngrams"] == 0 and out[3]["top_ngram"] is None
    assert out[3]["dup_ngram_frac"] == 0.0 and out[3]["top_ngram_share"] == 0.0


def test_repetition_tie_breaks_lexically(spark):
    # "a b" and "b a" both occur twice -> lexically smallest wins
    d = _docs(spark, [(1, "a b a b a")])
    row = with_repetition_stats(d, "doc_id", n=2).collect()[0]
    assert row["top_ngram"] == "a b"


# ---------------------------------------------------------------------------
# postings + BM25
# ---------------------------------------------------------------------------


def test_build_postings(spark):
    d = _docs(spark, [(1, "x y x"), (2, "y z"), (3, "z z z")])
    rows = {r["token"]: r for r in build_postings(d, "doc_id").collect()}
    assert rows["x"]["doc_freq"] == 1 and rows["x"]["total_tf"] == 2 and rows["x"]["min_doc_id"] == 1
    assert rows["y"]["doc_freq"] == 2 and rows["y"]["total_tf"] == 2
    assert rows["z"]["doc_freq"] == 2 and rows["z"]["total_tf"] == 4 and rows["z"]["min_doc_id"] == 2


def test_bm25_ranking_properties(spark):
    d = _docs(
        spark,
        [
            (1, "spark spark spark engine"),  # heavy on the query term
            (2, "spark engine"),  # one hit, shorter doc
            (3, "engine room"),  # no hit
        ],
    )
    out = {r["doc_id"]: r for r in bm25_scores(d, ["spark"], "doc_id").collect()}
    assert out[3]["score"] == 0.0
    assert out[1]["score"] > out[2]["score"] > 0.0
    assert out[1]["tf_spark"] == 3 and out[2]["dl"] == 2

    # rarer term scores higher than a ubiquitous one at equal tf
    d2 = _docs(spark, [(1, "rare common"), (2, "common"), (3, "common"), (4, "common")])
    r = {x["doc_id"]: x for x in bm25_scores(d2, ["rare", "common"], "doc_id").collect()}
    # doc 1 has both terms once; the rare-term contribution must dominate
    assert r[1]["score"] > 2 * r[2]["score"]


def test_bm25_no_terms_plan_is_narrow(spark):
    d = _docs(spark, [(1, "a b"), (2, "c")])
    plan = bm25_scores(d, ["a"], "doc_id")._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan or "BroadcastNestedLoopJoin" not in plan
