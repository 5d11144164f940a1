"""DSIR importance weighting (operators/dsir.py): direction of the
weights, smoothing fallbacks, and the REPRO.md determinism contract."""

import pytest

from ideafast_etl_spark.operators.dsir import (
    dsir_log_weights,
    hashed_ngram_buckets,
)


@pytest.fixture(scope="module")
def corpora(spark):
    target = spark.createDataFrame(
        [(100 + i, "clean english prose about science and method") for i in range(4)],
        ["doc_id", "text"],
    )
    raw = spark.createDataFrame(
        [
            (0, "clean english prose about science and method"),  # target-like
            (1, "zz yy xx ww vv uu tt ss"),                       # background-only
            (2, "clean english prose mixed with zz yy xx ww"),    # in between
        ],
        ["doc_id", "text"],
    )
    return raw, target


def test_weights_rank_target_likeness(spark, corpora):
    raw, target = corpora
    out = {r.doc_id: r for r in dsir_log_weights(raw, target, dim=512).collect()}
    assert out[0].log_weight > out[2].log_weight > out[1].log_weight
    assert out[0].selected and not out[1].selected


def test_features_include_bigrams(spark, corpora):
    raw, _ = corpora
    one = raw.filter("doc_id = 1")
    n = hashed_ngram_buckets(one, dim=1 << 20).agg({"cnt": "sum"}).collect()[0][0]
    assert n == 8 + 7  # 8 unigrams + 7 bigrams


def test_partitioning_determinism(spark, corpora):
    raw, target = corpora
    big = raw.union(
        spark.createDataFrame(
            [(10 + i, f"science method item {i} zz prose") for i in range(40)],
            ["doc_id", "text"],
        )
    )
    a = dsir_log_weights(big, target, dim=256).orderBy("doc_id").collect()
    b = (
        dsir_log_weights(big.repartition(9, "text"), target, dim=256)
        .orderBy("doc_id")
        .collect()
    )
    assert a == b


def test_empty_target_all_negativeish(spark, corpora):
    """With an empty target, p̂ is uniform 1/D: no doc can beat the raw
    background on its own mass — weights must be <= 0."""
    raw, target = corpora
    out = dsir_log_weights(raw, target.limit(0), dim=128).collect()
    assert out and all(r.log_weight <= 0 for r in out)
