"""End-to-end corpus-preparation pipeline — the LLM-side counterpart of
the reference-mirroring event pipeline (pipeline/dreem.py): chain the
verified cleaning operators into the sequence a pretraining data job
actually runs, with per-stage accounting.

    raw → cross-doc line dedup → quality gate → PII redaction
        → exact near-line dedup (first id wins) → token accounting

Every stage is one of this repo's oracle-verified operators
(operators/cleaning.py, functions/text.py), so the WHOLE pipeline gets a
composed DuckDB oracle: stage-by-stage document and token counts must
match bit-for-bit. No UDFs anywhere; the only shuffles are the line-
content window, the dedup hash window, and the five tiny stage
aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import text as T
from ..operators.cleaning import line_dedup, pii_redact_col

QUALITY_THRESHOLD = 0.6


def _stage(name: str, df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.agg(
        F.lit(name).alias("stage"),
        F.count(F.lit(1)).alias("n_docs"),
        F.coalesce(
            F.sum(T.token_count(F.col(text_col)).cast("long")), F.lit(0)
        ).alias("n_tokens"),
    ).select("stage", "n_docs", "n_tokens")


def corpus_prep(
    docs: DataFrame, text_col: str = "text"
) -> tuple[DataFrame, DataFrame]:
    """Run the prep chain; return (survivors, stage_report) — the cleaned
    corpus (doc_id, text) after the final dedup rung, and the per-stage
    (stage, n_docs, n_tokens) accounting. The streaming twin
    (streaming/corpus.py) publishes both as snapshots per drain."""
    s0 = _stage("0_raw", docs.select(F.col(text_col).alias("text")))
    d1 = line_dedup(docs, text_col, with_text=True).select("doc_id", "text")
    s1 = _stage("1_line_dedup", d1)
    d2 = d1.filter(T.quality_score(F.col("text")) >= QUALITY_THRESHOLD)
    s2 = _stage("2_quality", d2)
    d3 = d2.select("doc_id", pii_redact_col(F.col("text")).alias("text"))
    s3 = _stage("3_pii_redacted", d3)
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    w = Window.partitionBy("__norm").orderBy("doc_id")
    d4 = (
        d3.withColumn("__norm", norm)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__norm", "__rn")
    )
    s4 = _stage("4_exact_dedup", d4)
    report = (
        s0.unionByName(s1)
        .unionByName(s2)
        .unionByName(s3)
        .unionByName(s4)
        .orderBy("stage")
    )
    return d4, report


def corpus_prep_stages(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Run the prep chain and return (stage, n_docs, n_tokens) per stage."""
    return corpus_prep(docs, text_col)[1]
