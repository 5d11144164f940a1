"""n-gram LM training + add-k perplexity (operators/lm.py).

Verifies the probability math against a tiny hand-computed corpus, the
add-1 smoothing fallbacks (unseen word, unseen context), and the REPRO.md
determinism contract (identical output under different partitionings).
"""

import math

import pytest
from pyspark.sql import functions as F

from ideafast_etl_spark.operators.lm import score_perplexity, train_ngram_lm


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "a b a b a c"),
        (1, "a b"),
        (2, "c c c"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_train_counts(spark, corpus):
    nc, cc, v = train_ngram_lm(corpus, n=2)
    counts = {(r.ctx, r.w): r.c_nw for r in nc.collect()}
    # doc0 bigrams: ab ba ab ba ac, doc1: ab, doc2: cc cc
    assert counts == {
        ("a", "b"): 3,
        ("b", "a"): 2,
        ("a", "c"): 1,
        ("c", "c"): 2,
    }
    ctx = {r.ctx: r.c_ctx for r in cc.collect()}
    assert ctx == {"a": 4, "b": 2, "c": 2}
    assert v.collect()[0].n_vocab == 3  # a, b, c


def test_perplexity_hand_computed(spark, corpus):
    nc, cc, v = train_ngram_lm(corpus, n=2)
    out = {
        r.doc_id: r
    for r in score_perplexity(corpus, nc, cc, v, n=2, k=1).collect()}
    # doc1 = "a b": one bigram (a,b): p = (3+1)/(4+3) = 4/7
    lp = round(math.log(4) - math.log(7), 6)
    assert out[1].n_ngrams == 1
    assert out[1].avg_logprob == pytest.approx(lp, abs=2e-6)
    assert out[1].perplexity == pytest.approx(round(math.exp(-lp), 4), abs=2e-4)
    # doc2 = "c c c": two (c,c) bigrams, p = (2+1)/(2+3) each
    lp2 = math.log(3) - math.log(5)
    assert out[2].n_ngrams == 2
    assert out[2].avg_logprob == pytest.approx(lp2, abs=2e-6)


def test_unseen_fallbacks(spark, corpus):
    nc, cc, v = train_ngram_lm(corpus, n=2)
    probe = spark.createDataFrame(
        [(10, "b c"), (11, "z z")], ["doc_id", "text"]
    )
    out = {r.doc_id: r for r in
           score_perplexity(probe, nc, cc, v, n=2, k=1).collect()}
    # (b,c) unseen with seen context b (c_ctx=2): p = 1/(2+3)
    assert out[10].avg_logprob == pytest.approx(math.log(1 / 5), abs=2e-6)
    # (z,z): context unseen entirely -> uniform 1/V = 1/3
    assert out[11].avg_logprob == pytest.approx(math.log(1 / 3), abs=2e-6)
    assert out[11].perplexity == pytest.approx(3.0, abs=1e-3)


def test_short_docs_dropped(spark, corpus):
    nc, cc, v = train_ngram_lm(corpus, n=2)
    probe = spark.createDataFrame([(20, "solo")], ["doc_id", "text"])
    assert score_perplexity(probe, nc, cc, v, n=2, k=1).count() == 0


def test_trigram_order(spark, corpus):
    nc, cc, v = train_ngram_lm(corpus, n=3)
    counts = {(r.ctx, r.w): r.c_nw for r in nc.collect()}
    assert counts[("a b", "a")] == 2  # doc0: "a b a" twice
    assert counts[("c c", "c")] == 1


def test_partitioning_determinism(spark, corpus):
    """REPRO.md contract: fixed-point long sums make the scored values
    bit-identical under any partitioning."""
    big = corpus.union(
        spark.createDataFrame(
            [(i, "a b c a b " * (i % 5 + 1)) for i in range(100, 140)],
            ["doc_id", "text"],
        )
    )
    nc, cc, v = train_ngram_lm(big, n=2)
    a = score_perplexity(big, nc, cc, v).orderBy("doc_id").collect()
    b = (
        score_perplexity(big.repartition(7, "text"), nc, cc, v)
        .orderBy("doc_id")
        .collect()
    )
    assert a == b


def test_kneser_ney_hand_computed(spark, corpus):
    from ideafast_etl_spark.operators.lm import score_kn_perplexity

    nc, cc, v = train_ngram_lm(corpus, n=2)
    probe = spark.createDataFrame([(30, "a b"), (31, "z z")], ["doc_id", "text"])
    out = {r.doc_id: r for r in
           score_kn_perplexity(probe, nc, cc, v, n=2).collect()}
    # training: bigram types = {(a,b),(b,a),(a,c),(c,c)} -> n_types=4, V=3
    # p_cont(b) = (N1+(*,b)+1)/(4+3) = 2/7; ctx a: c_ctx=4, N1+(a,*)=2
    p_ab = (3 - 0.75) / 4 + (0.75 * 2 / 4) * (2 / 7)
    assert out[30].avg_logprob == pytest.approx(math.log(p_ab), abs=2e-6)
    # (z,z): unseen ctx -> p_cont(z) = (0+1)/(4+3)
    assert out[31].avg_logprob == pytest.approx(math.log(1 / 7), abs=2e-6)


def test_kneser_ney_prob_mass_bounded(spark, corpus):
    """Every scored probability must be in (0, 1]: perplexity >= 1."""
    from ideafast_etl_spark.operators.lm import score_kn_perplexity

    nc, cc, v = train_ngram_lm(corpus, n=2)
    rows = score_kn_perplexity(corpus, nc, cc, v, n=2).collect()
    assert rows and all(r.perplexity >= 1.0 for r in rows)


def test_fused_equals_composed_addk_and_kn(spark):
    """ADVICE r10 #4: the fused one-gram-pass ngram_lm_perplexity must be
    row-for-row identical to train_ngram_lm + score_*_perplexity on the
    same corpus — the c(ctx,w) = Σ_docs c_occ rollup identity, exercised
    over repeats (c_occ > 1), a sub-bigram doc (vocab-only token), and
    shared/unshared grams."""
    from ideafast_etl_spark.operators.lm import (
        ngram_lm_perplexity,
        score_kn_perplexity,
    )

    rows = [
        (0, "a b a b a c a b"),   # repeated grams -> c_occ > 1
        (1, "a b"),
        (2, "c c c d c"),
        (3, "e"),                 # sub-bigram: no grams, vocab token only
        (4, "d a b e c"),
    ]
    corpus = spark.createDataFrame(rows, ["doc_id", "text"])

    nc, cc, v = train_ngram_lm(corpus, n=2)
    composed_addk = sorted(
        map(tuple, score_perplexity(corpus, nc, cc, v, n=2, k=1).collect())
    )
    fused_addk = sorted(
        map(tuple, ngram_lm_perplexity(corpus, n=2, k=1).collect())
    )
    assert fused_addk == composed_addk

    composed_kn = sorted(
        map(
            tuple,
            score_kn_perplexity(corpus, nc, cc, v, n=2, discount=0.75)
            .collect(),
        )
    )
    fused_kn = sorted(
        map(
            tuple,
            ngram_lm_perplexity(
                corpus, n=2, smoothing="kn", discount=0.75
            ).collect(),
        )
    )
    assert fused_kn == composed_kn
