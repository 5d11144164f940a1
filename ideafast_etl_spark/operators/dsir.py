"""DSIR — Data Selection via Importance Resampling (SURVEY.md §2.13;
Xie et al. 2023, arXiv:2302.03169): select raw-corpus documents that look
like a small target corpus, by importance weights over hashed n-gram
features.

The published recipe, re-expressed as DataFrame algebra:

1. hash each document's word unigrams AND bigrams into D buckets
   (``stable_bucket`` — sha256-derived, engine-portable),
2. fit two bag-of-buckets unigram distributions with add-1 smoothing:
   p̂ from the TARGET set, q̂ from the RAW corpus,
3. per raw document, the log importance weight is
   ``Σ_b c_b · (ln p̂_b − ln q̂_b)`` — documents whose feature profile is
   more probable under the target than under the raw background score
   positive,
4. select by weight (the paper resamples; the deterministic analog is a
   threshold/top-k on the weight).

Scale posture: both fitted distributions are D-row tables (D is a config
constant, default 4096) — they broadcast; the corpus side is one explode +
one keyed (doc, bucket) agg + two broadcast joins + one per-doc agg. No
data-sized shuffle beyond the uniform doc/bucket keys.

Float discipline (REPRO.md): p̂_b and q̂_b are integer-count rationals
``(c_b + 1) / (N + D)``; each bucket's log-ratio is quantized to a
fixed-point long and the per-doc sum is an associative integer reduction —
bit-identical at any parallelism and engine (the DuckDB oracle twin runs
the same arithmetic).

Reference parity: no selection machinery exists in the reference
(``ideafast_etl/``); this is part of the mandated training-data extension
surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import norm_text
from .packing import stable_bucket

_FP = 1_000_000  # fixed-point grid for log-ratio quantization
_SALT = "dsir"


def hashed_ngram_buckets(
    df: DataFrame,
    dim: int = 4096,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, bucket, cnt): word unigram + bigram features hashed into
    ``dim`` buckets — the paper's feature map. One explode + one keyed
    agg, all JVM."""
    toks = df.select(
        F.col(id_col), F.split(norm_text(F.col(text_col)), " ").alias("t")
    )
    grams = toks.select(
        F.col(id_col),
        F.explode(
            F.concat(
                F.col("t"),
                F.expr(
                    "transform(sequence(1, greatest(size(t) - 1, 0)), "
                    "i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))"
                ),
            )
        ).alias("g"),
    )
    return (
        grams.withColumn("bucket", stable_bucket("g", dim, _SALT))
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _bucket_totals(feats: DataFrame) -> DataFrame:
    """D-row (bucket, total) table from per-doc bucket counts."""
    return feats.groupBy("bucket").agg(F.sum("cnt").alias("total"))


def dsir_log_weights(
    raw: DataFrame,
    target: DataFrame,
    dim: int = 4096,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-raw-document DSIR log importance weight.

    Output: (id, n_feats, log_weight, selected) — ``log_weight`` is the
    fixed-point-exact ``Σ c_b (ln p̂_b − ln q̂_b)`` rounded to 6 dp,
    ``selected`` is the deterministic threshold rule (> 0: the document
    is more target-like than background-like)."""
    raw_feats = hashed_ngram_buckets(raw, dim, text_col, id_col)
    tgt_tot = _bucket_totals(
        hashed_ngram_buckets(target, dim, text_col, id_col)
    ).withColumnRenamed("total", "c_t")
    raw_tot = _bucket_totals(raw_feats).withColumnRenamed("total", "c_r")
    tgt_n = tgt_tot.agg(
        F.coalesce(F.sum("c_t"), F.lit(0)).alias("n_t")  # empty target OK
    )
    raw_n = raw_tot.agg(F.coalesce(F.sum("c_r"), F.lit(0)).alias("n_r"))
    joined = (
        raw_feats.join(F.broadcast(tgt_tot), "bucket", "left")
        .join(F.broadcast(raw_tot), "bucket", "left")
        .crossJoin(F.broadcast(tgt_n))
        .crossJoin(F.broadcast(raw_n))
        .select(
            F.col(id_col),
            F.col("cnt"),
            F.coalesce(F.col("c_t"), F.lit(0)).alias("c_t"),
            F.coalesce(F.col("c_r"), F.lit(0)).alias("c_r"),
            F.col("n_t"),
            F.col("n_r"),
        )
    )
    # ln p̂ − ln q̂ with add-1 over D buckets: every operand an integer
    log_ratio = (
        F.log(F.col("c_t") + F.lit(1))
        - F.log(F.col("n_t") + F.lit(dim))
        - F.log(F.col("c_r") + F.lit(1))
        + F.log(F.col("n_r") + F.lit(dim))
    )
    lw_fp = F.round(log_ratio * F.lit(_FP)).cast("long") * F.col("cnt")
    per_doc = joined.select(F.col(id_col), lw_fp.alias("lw"), "cnt").groupBy(
        id_col
    ).agg(
        F.sum("cnt").alias("n_feats"),
        F.sum("lw").alias("__s"),
    )
    lw = F.col("__s").cast("double") / F.lit(_FP)
    return per_doc.select(
        F.col(id_col),
        F.col("n_feats"),
        F.round(lw, 6).alias("log_weight"),
        (F.col("__s") > 0).alias("selected"),
    )
