"""Text analysis + dedup operator tests on constructed corpora with known
duplicates/near-duplicates."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from batch_data_pipeline_exercise_spark.operators import dedup, text

DOCS = [
    (1, "The quick brown fox jumps over the lazy dog near the river bank today."),
    (2, "The quick brown fox jumps over the lazy dog near the river bank today."),  # exact dup of 1
    (3, "the  quick  Brown fox JUMPS over the lazy dog near the river bank today. "),  # normalized dup of 1
    (4, "The quick brown fox jumps over the lazy cat near the river bank today."),  # near-dup (1 word)
    (5, "Completely different content talking about databases and distributed query engines instead."),
    (6, "le chat et le chien et les amis le la les des et la le chat"),
    (7, "der hund und die katze und das ein der die und der das ein"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id int, text string").cache()


def test_exact_dedup(spark, docs):
    out = dedup.exact_dedup(docs, "doc_id")
    kept = {r["doc_id"]: r["dup_count"] for r in out.collect()}
    assert 1 in kept and kept[1] == 3  # 1, 2 and whitespace/case-variant 3
    assert 2 not in kept and 3 not in kept
    assert kept[4] == 1 and kept[5] == 1

    strict = dedup.exact_dedup(docs, "doc_id", normalized=False)
    kept2 = {r["doc_id"]: r["dup_count"] for r in strict.collect()}
    assert kept2[1] == 2 and 3 in kept2  # only byte-identical collapse


def test_minhash_near_dups(spark, docs):
    pairs = {(r["id1"], r["id2"]): r["jaccard"] for r in dedup.minhash_near_dups(docs, "doc_id", threshold=0.5).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] == 1.0
    assert (1, 3) in pairs and pairs[(1, 3)] == 1.0
    assert (1, 4) in pairs and 0.5 <= pairs[(1, 4)] < 1.0
    assert not any(5 in p for p in pairs)  # distinct doc never pairs


def test_ngram_jaccard_exact(spark, docs):
    pairs = {(r["id1"], r["id2"]): r["jaccard"] for r in dedup.ngram_jaccard_pairs(docs, "doc_id", threshold=0.4).collect()}
    assert pairs[(1, 2)] == 1.0
    assert (1, 4) in pairs
    assert not any(5 in p or 6 in p for p in pairs)


def test_simhash_near_dups(spark, docs):
    s = {r["id"]: (r["simhash_hi"], r["simhash_lo"]) for r in dedup.simhash(docs, "doc_id").collect()}
    assert s[1] == s[2] == s[3]  # identical token sets → identical simhash
    assert all(0 <= hi < 2**32 and 0 <= lo < 2**32 for hi, lo in s.values())

    pairs = {(r["id1"], r["id2"]): r["hamming"] for r in dedup.simhash_near_dups(docs, "doc_id", max_hamming=10).collect()}
    assert pairs[(1, 2)] == 0 and pairs[(1, 3)] == 0
    assert (1, 5) not in pairs


def test_text_stats_and_quality(spark, docs):
    out = {r["doc_id"]: r for r in text.with_quality_score(docs).collect()}
    r1 = out[1]
    assert r1["n_chars"] == len(DOCS[0][1])
    assert r1["n_words"] == 14
    assert r1["n_tokens"] == 15  # 14 words + final period
    assert r1["n_punct"] == 1
    assert 0 < r1["stopword_ratio"] <= 1
    assert 0 <= r1["quality_score"] <= 1
    assert out[5]["quality_score"] > 0  # long clean text scores

    # determinism: re-run yields identical scores
    again = {r["doc_id"]: r["quality_score"] for r in text.with_quality_score(docs).collect()}
    assert all(again[k] == out[k]["quality_score"] for k in again)


def test_lang_id(spark, docs):
    out = {r["doc_id"]: r["lang_pred"] for r in text.with_lang_id(docs).collect()}
    assert out[1] == "en"
    assert out[6] == "fr"
    assert out[7] == "de"
    zh = spark.createDataFrame([(9, "这是一个中文文档 关于数据处理 的 系统")], "doc_id int, text string")
    assert text.with_lang_id(zh).first()["lang_pred"] == "zh"


def test_fingerprint(spark, docs):
    out = {r["doc_id"]: r for r in text.with_fingerprint(docs).collect()}
    assert out[1]["fingerprint"] == out[2]["fingerprint"]
    assert out[1]["fingerprint"] != out[3]["fingerprint"]  # raw differs
    assert out[1]["fingerprint_norm"] == out[3]["fingerprint_norm"]  # normalized matches


def test_char_shingles_cjk_near_dup(spark):
    """CJK text has no whitespace — character shingles make minhash work
    where word shingles see one giant token."""
    zh = spark.createDataFrame(
        [
            (1, "数据管道每天处理批量订单事件并构建维度模型与事实表"),
            (2, "数据管道每天处理批量订单事件并构建维度模型和事实表"),  # one char differs
            (3, "完全不同的内容讲述机器学习训练样本的去重方法与策略"),
        ],
        "doc_id int, text string",
    )
    sh = dedup.char_shingles(zh, "doc_id", n=5)
    sig = dedup.minhash_signatures(sh, k=32)
    cand = dedup.lsh_candidate_pairs(dedup.lsh_band_keys(sig, bands=8, rows=4))
    pairs = {(r["id1"], r["id2"]) for r in cand.collect()}
    assert (1, 2) in pairs
    jac = {(r["id1"], r["id2"]): r["jaccard"] for r in dedup.exact_jaccard(cand, sh).collect()}
    assert jac[(1, 2)] > 0.6
    assert not any(3 in p for p in pairs)

    # word shingles would lump each doc into ONE shingle — no resolution
    word_sh = dedup.word_shingles(zh, "doc_id")
    assert word_sh.groupBy("id").count().agg(F.max("count")).first()[0] == 1
