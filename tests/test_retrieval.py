"""BM25 retrieval scoring (operators/retrieval.py)."""

import pytest

from ideafast_etl_spark.operators.retrieval import bm25_scores


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bm25_ranks_and_filters(spark):
    docs = _docs(
        spark,
        [
            (1, "spark spark spark filler filler"),
            (2, "spark filler filler filler filler"),
            (3, "nothing relevant here at all"),
            (4, "spark query filler filler filler"),
        ],
    )
    out = {r.doc_id: r for r in bm25_scores(docs, ["spark", "query"]).collect()}
    assert 3 not in out  # no query terms -> absent
    assert out[1].n_terms_hit == 1 and out[4].n_terms_hit == 2
    # higher tf scores higher (same doc length)
    assert out[1].score > out[2].score
    # two matching terms beat one occurrence of one term
    assert out[4].score > out[2].score
    assert all(r.score > 0 for r in out.values())


def test_bm25_deterministic_across_partitioning(spark):
    rows = [(i, ("spark query " if i % 3 == 0 else "") + "x y z w") for i in range(60)]
    docs = _docs(spark, rows)
    a = sorted(map(tuple, bm25_scores(docs, ["spark", "query"]).collect()))
    b = sorted(
        map(tuple, bm25_scores(docs.repartition(13), ["spark", "query"]).collect())
    )
    assert a == b


def test_bm25_rare_term_outweighs_common(spark):
    # 'rare' appears in 1 doc, 'common' in all: idf must dominate
    rows = [(i, "common " + ("rare " if i == 0 else "") + "pad pad") for i in range(20)]
    out = {r.doc_id: r for r in bm25_scores(_docs(spark, rows), ["common", "rare"]).collect()}
    contribution_rare = out[0].score - out[1].score  # doc0 = common+rare, doc1 = common
    assert contribution_rare > out[1].score  # rare term's score > common term's
