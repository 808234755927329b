"""The fused no-shuffle minhash signature operator must be EXACTLY the
explode+groupBy form, row set and component values alike — the r14
optimization replaced the plan shape, never the result.

Edge rows are the contract: a document with no non-empty shingle
(NULL / empty / whitespace-only text) must be ABSENT from the output,
exactly as the explode form's filter+groupBy drops it; a document
shorter than the shingle width still signs its single short shingle.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from batch_data_pipeline_exercise_spark.operators import dedup

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy dog"),  # exact dup
    (3, "pack my box with five dozen liquor jugs"),
    (4, "sphinx of black quartz judge my vow"),
    (5, "short doc"),  # fewer tokens than the shingle width
    (6, "one"),  # single token
    (7, ""),  # empty -> no shingles -> NO signature row
    (8, "   "),  # whitespace-only -> NO signature row
    (9, None),  # NULL text -> NO signature row
    (10, "The  QUICK   brown fox; jumps over\tthe lazy dog"),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_fused_equals_explode_form(docs_df):
    explode_form = dedup.minhash_signatures(
        dedup.word_shingles(docs_df, "doc_id", distinct=False), k=32
    )
    fused = dedup.minhash_signatures_docs(docs_df, "doc_id", k=32)
    a = explode_form.select("id", F.col("sig").cast("array<bigint>").alias("sig"))
    b = fused.select("id", F.col("sig").cast("array<bigint>").alias("sig"))
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0
    # and the row set is exactly the docs with >= 1 non-empty shingle
    ids = sorted(r["id"] for r in b.select("id").collect())
    assert ids == [1, 2, 3, 4, 5, 6, 10]


def test_fused_equals_explode_form_k_not_32(docs_df):
    """The flagship runs k=65 (13x5) — pin a non-default k too."""
    explode_form = dedup.minhash_signatures(
        dedup.word_shingles(docs_df, "doc_id", distinct=False), k=65
    )
    fused = dedup.minhash_signatures_docs(docs_df, "doc_id", k=65)
    a = explode_form.select("id", F.col("sig").cast("array<bigint>").alias("sig"))
    b = fused.select("id", F.col("sig").cast("array<bigint>").alias("sig"))
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_fused_plan_has_no_exchange(docs_df):
    """The point of the fusion: the signature is one map-only projection.
    (For file-backed inputs load() may still inject its conditional
    spreading repartition — this pins the OPERATOR adding none.)"""
    fused = dedup.minhash_signatures_docs(docs_df, "doc_id", k=32)
    plan = fused._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
