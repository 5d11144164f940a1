"""Text retrieval scoring (§2.13): BM25 over the documents table — the
ranking function a corpus-curation pipeline uses to find documents relevant
to a probe query (quality probes, topic filters, retrieval-based data
selection a la DSIR).

Plan shape at 100 TB: the query term set is BOUNDED (a handful of terms),
so everything data-sized stays on the corpus side of broadcasts:

1. per-doc token counts (one explode + agg keyed on doc_id),
2. corpus scalars (N, avg doc length) as a 1-row aggregate broadcast back
   (NOT an unpartitioned window — that would drag the per-doc table onto
   a single partition),
3. tokens filtered to the literal query-term set before any shuffle,
4. document frequencies of the query terms (|query| rows) broadcast back,
5. one final agg keyed on the uniform doc id.

Float discipline: each (doc, term) contributes exactly one term score (a
conditional single-row sum — never a multi-row float accumulation), and
the per-doc total adds the per-term columns in sorted-term order, so the
summation order is identical in any engine at any parallelism. The idf's
``ln`` is the one engine-dependent transcendental; rounding the total to
6 dp absorbs final-ulp libm divergence.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import _tokens


def bm25_scores(
    df: DataFrame,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score every document containing at least one query term with Okapi
    BM25 (k1/b defaults per the literature). Returns (id, n_terms_hit,
    score), score rounded to 6 dp."""
    terms = sorted(set(query_terms))
    toks = df.select(
        F.col(id_col), F.explode(_tokens(F.col(text_col))).alias("t")
    )
    dl = toks.groupBy(id_col).agg(F.count("*").alias("dl"))
    stats = dl.agg(
        F.sum("dl").alias("__sum_dl"), F.count("*").alias("n_docs")
    )
    dl = dl.crossJoin(F.broadcast(stats)).withColumn(
        "avgdl", F.col("__sum_dl") / F.col("n_docs")
    )
    tf = (
        toks.filter(F.col("t").isin(terms))
        .groupBy(id_col, "t")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("t").agg(F.count("*").alias("df"))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    per_term = (
        tf.join(F.broadcast(dfreq), "t")
        .join(dl, id_col)
        .withColumn(
            "term_score",
            idf
            * F.col("tf")
            / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))),
        )
    )
    # one conditional single-row sum per term, added in sorted-term order:
    # the float summation order is engine- and parallelism-independent
    term_cols: list[Column] = [
        F.coalesce(
            F.sum(F.when(F.col("t") == t, F.col("term_score"))), F.lit(0.0)
        )
        for t in terms
    ]
    total = reduce(lambda a, c: a + c, term_cols)
    return per_term.groupBy(id_col).agg(
        F.count("*").alias("n_terms_hit"),
        F.round(total, 6).alias("score"),
    )


def tf_idf_top_terms(
    df: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` characteristic terms per document by tf-idf (§2.13 — the
    keyword-extraction / topic-signal primitive of corpus curation).

    score = tf * ln(n_docs / df): every factor is either an integer
    aggregate (tf, df, n_docs) or a single transcendental over an
    integer-derived ratio — NO cross-row float summation anywhere, so the
    value is deterministic at any parallelism; rounding to 6 dp absorbs
    last-ulp libm divergence between engines, and the per-doc ranking
    orders by the ROUNDED score (term-asc tie-break), so both engines rank
    identical values identically.

    Plan shape at 100 TB: tf aggregates on the uniform (doc, term) key;
    document frequency aggregates on term (stopword skew is count-only
    with map-side partials); the df table is vocabulary-sized, so its join
    back to tf is left to AQE (shuffle join on term when the vocab
    outgrows broadcast); n_docs rides a 1-row broadcast; the final top-k
    window shuffles on the uniform doc id only."""
    toks = df.select(
        F.col(id_col), F.explode(_tokens(F.col(text_col))).alias("term")
    )
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = df.groupBy().agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "score",
            F.round(
                F.col("tf")
                * F.log(F.col("n_docs").cast("double") / F.col("df")),
                6,
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("term_rank", F.row_number().over(w))
        .filter(F.col("term_rank") <= k)
        .select(id_col, "term", "tf", "score", "term_rank")
    )


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str = "doc_id",
    score_col: str = "score",
    k: int = 60,
    per_list_k: int | None = None,
    rank_names: list[str] | None = None,
) -> DataFrame:
    """Reciprocal Rank Fusion (Cormack, Clarke & Büttcher, SIGIR 2009) —
    the standard hybrid-retrieval combiner: fuse N independent rankings
    (e.g. BM25 lexical + embedding cosine) by RRF(d) = Σ_i 1/(k + rank_i(d))
    over the rankings that contain d. No score calibration needed — only
    ranks enter the formula, which is why RRF survives heterogeneous
    rankers where score interpolation needs tuning.

    Scale posture: each ranking is ranked with the distributed
    ``global_rank`` (range repartition + per-partition offsets — never a
    single-partition window over a corpus-sized relation), optionally
    truncated to its top ``per_list_k`` (candidate-set fusion, the
    production shape: fuse top-M from each ranker, not whole corpora).
    The merge is a full-outer equi-join on the id across the bounded
    candidate lists.

    Float discipline: each contribution 1/(k + rank) is one IEEE double
    division; the total adds the per-ranking columns in FIXED list order
    (a column expression, not a multi-row aggregation), so the sum is
    engine- and parallelism-independent; rounded to 6 dp.

    Ties: equal scores rank by ascending id (total order), matching the
    oracle's ``ORDER BY score DESC, id`` row_number."""
    from .ranking import global_rank

    names = rank_names or [f"rank_{i}" for i in range(len(rankings))]
    assert len(names) == len(rankings) and len(rankings) >= 1
    merged: DataFrame | None = None
    for r, name in zip(rankings, names):
        ranked = global_rank(
            r.select(F.col(id_col), F.col(score_col)),
            [F.col(score_col).desc(), F.col(id_col).asc()],
            rank_col=name,
        ).select(id_col, F.col(name).cast("int").alias(name))
        if per_list_k is not None:
            ranked = ranked.filter(F.col(name) <= per_list_k)
        merged = (
            ranked
            if merged is None
            else merged.join(ranked, id_col, "full_outer")
        )
    contribs = [
        F.coalesce(
            F.lit(1.0) / (F.lit(float(k)) + F.col(n).cast("double")),
            F.lit(0.0),
        )
        for n in names
    ]
    total = reduce(lambda a, c: a + c, contribs)
    return merged.select(
        id_col, *names, F.round(total, 6).alias("rrf_score")
    )
