"""Corpus-hygiene operators (operators/corpus.py): decontamination,
repetition quality signals, temperature resampling."""

import pytest

from pyspark.sql import functions as F

from ideafast_etl_spark.operators.corpus import (
    ngram_decontaminate,
    repetition_stats,
    temperature_sample,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_decontaminate_flags_overlap_only(spark):
    corpus = _docs(
        spark,
        [
            (1, "alpha beta gamma delta epsilon"),  # contains eval 4-gram
            (2, "zeta eta theta iota kappa"),  # disjoint
            (3, "alpha beta gamma delta"),  # exactly the eval 4-gram
        ],
    )
    eval_df = _docs(spark, [(100, "alpha beta gamma delta")])
    out = ngram_decontaminate(corpus, eval_df, n=4).orderBy("doc_id").collect()
    assert [r.doc_id for r in out] == [1, 3]
    by_id = {r.doc_id: r for r in out}
    # doc 1 has 2 distinct 4-grams, 1 hit; doc 3 has 1 gram, 1 hit
    assert (by_id[1].n_hits, by_id[1].n_grams) == (1, 2)
    assert (by_id[3].n_hits, by_id[3].n_grams) == (1, 1)
    assert by_id[3].hit_ratio == 1.0


def test_repetition_stats_degenerate_doc(spark):
    out = repetition_stats(
        _docs(
            spark,
            [
                (1, "spam spam spam spam"),  # fully degenerate
                (2, "a b c d"),  # fully distinct
                (3, "x y x y x"),  # top bigram 'x y' = 2/4
            ],
        )
    )
    by_id = {r.doc_id: r for r in out.collect()}
    assert by_id[1].distinct_ratio == 0.25
    assert by_id[1].top_word == "spam"
    assert by_id[1].top_word_frac == 1.0
    assert by_id[1].top_bigram_frac == 1.0
    assert by_id[2].distinct_ratio == 1.0
    # tie on counts -> lexicographically smallest token wins
    assert by_id[2].top_word == "a"
    assert by_id[3].top_bigram == "x y"
    assert by_id[3].top_bigram_frac == 0.5


def test_repetition_stats_single_word_doc(spark):
    row = repetition_stats(_docs(spark, [(9, "solo")])).collect()[0]
    assert row.n_words == 1
    assert row.top_bigram is None
    assert row.top_bigram_frac is None


def test_temperature_sample_keeps_rarest_stratum_fully(spark):
    rows = [(i, "big") for i in range(400)] + [(i + 1000, "rare") for i in range(16)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = temperature_sample(df, "lang", "doc_id", salt="t")
    kept = {r.lang: 0 for r in out.select("lang").distinct().collect()}
    for r in out.groupBy("lang").count().collect():
        kept[r.lang] = r["count"]
    # rate(rare) = sqrt(16/16) = 1.0 -> everything survives
    assert kept["rare"] == 16
    # rate(big) = sqrt(16/400) = 0.2 -> roughly a fifth survives, never all
    assert 0 < kept["big"] < 400
    rates = {
        r.lang: r.sample_rate
        for r in out.select("lang", "sample_rate").distinct().collect()
    }
    assert rates["rare"] == 1.0
    assert rates["big"] == pytest.approx(0.2)


def test_temperature_sample_deterministic(spark):
    rows = [(i, "a" if i % 3 else "b") for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    ids1 = sorted(r.doc_id for r in temperature_sample(df, "lang", "doc_id").collect())
    ids2 = sorted(
        r.doc_id
        for r in temperature_sample(df.repartition(7), "lang", "doc_id").collect()
    )
    assert ids1 == ids2


def test_corpus_ops_empty_inputs(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    docs = _docs(spark, [(1, "a b c d")])
    # empty eval set -> nothing is contaminated
    assert ngram_decontaminate(docs, empty, n=2).count() == 0
    # empty corpus -> no rows out of either op
    assert ngram_decontaminate(empty, docs, n=2).count() == 0
    assert repetition_stats(empty).count() == 0
    empty_l = spark.createDataFrame([], "doc_id long, lang string")
    assert temperature_sample(empty_l, "lang", "doc_id").count() == 0
