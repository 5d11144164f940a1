"""Bloom-prefiltered decontamination (operators/corpus.py): exactness
under any filter size (false positives must die in the verify join),
no-false-negative property, and real pruning."""

import pytest
from pyspark.sql import functions as F

from ideafast_etl_spark.operators.corpus import (
    BLOOM_K,
    _bloom_positions,
    bloom_might_contain,
    bloom_ngram_decontaminate,
    build_ngram_bloom,
    ngram_decontaminate,
)
from ideafast_etl_spark.operators.dedup import shingle_rows


@pytest.fixture(scope="module")
def corpora(spark):
    evald = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta"),
         (101, "one two three four five six seven")],
        ["doc_id", "text"],
    )
    corpus = spark.createDataFrame(
        [(0, "alpha beta gamma delta something else entirely here"),
         (1, "totally clean document with no overlap at all present"),
         (2, "one two three four noise noise one two three four")],
        ["doc_id", "text"],
    )
    return corpus, evald


def _rows(df):
    return sorted(
        (r.doc_id, r.n_hits, r.n_grams, r.hit_ratio) for r in df.collect()
    )


def test_matches_exact_operator(spark, corpora):
    corpus, evald = corpora
    exact = _rows(ngram_decontaminate(corpus, evald, n=4))
    bloom = _rows(bloom_ngram_decontaminate(corpus, evald, n=4))
    assert bloom == exact
    assert len(exact) == 2  # docs 0 and 2 are contaminated, doc 1 clean


def test_exact_even_when_bloom_saturated(spark, corpora):
    """A tiny (64-bit) filter saturates -> every shingle is a candidate,
    yet the verify join keeps the output exact."""
    corpus, evald = corpora
    exact = _rows(ngram_decontaminate(corpus, evald, n=4))
    assert _rows(bloom_ngram_decontaminate(corpus, evald, n=4, m_bits=64)) == exact


def test_no_false_negatives(spark, corpora):
    """Every eval shingle must pass its own filter (Bloom guarantee)."""
    _, evald = corpora
    bloom = build_ngram_bloom(evald, n=4, m_bits=1 << 12)
    sh = shingle_rows(evald, "text", "doc_id", 4).select("shingle").distinct()
    n = sh.count()
    passed = (
        sh.crossJoin(F.broadcast(bloom))
        .filter(bloom_might_contain(F.col("shingle"), F.col("bloom"), 1 << 12))
        .count()
    )
    assert passed == n


def test_prefilter_prunes_clean_shingles(spark, corpora):
    """With an adequately sized filter, the clean doc's shingles are
    rejected before the join (candidate count well below total)."""
    corpus, evald = corpora
    bloom = build_ngram_bloom(evald, n=4, m_bits=1 << 12)
    sh = shingle_rows(corpus, "text", "doc_id", 4)
    total = sh.count()
    candidates = (
        sh.crossJoin(F.broadcast(bloom))
        .filter(bloom_might_contain(F.col("shingle"), F.col("bloom"), 1 << 12))
        .count()
    )
    assert candidates < total
    # never fewer than the truly-contaminated shingles (no false negatives)
    eval_sh = (
        shingle_rows(evald, "text", "doc_id", 4).select("shingle").distinct()
    )
    true_hits = sh.join(eval_sh, "shingle").count()
    assert true_hits >= 1 and candidates >= true_hits


def test_positions_in_range_and_spread(spark):
    df = spark.range(200).select(F.concat(F.lit("tok"), F.col("id")).alias("s"))
    m = 1 << 10
    pos = df.select(
        F.explode(F.array(*_bloom_positions(F.col("s"), m))).alias("p")
    )
    stats = pos.agg(
        F.min("p").alias("lo"), F.max("p").alias("hi"),
        F.count_distinct("p").alias("nd"), F.count("*").alias("n"),
    ).collect()[0]
    assert stats.lo >= 0 and stats.hi < m
    assert stats.n == 200 * BLOOM_K
    assert stats.nd > 500  # hashes actually spread
