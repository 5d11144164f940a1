"""Corpus-hygiene operators for LLM training pipelines (SURVEY.md §2.13
extensions): benchmark decontamination, repetition-based quality signals,
and temperature-based stratum resampling.

These sit between dedup (operators/dedup.py) and sampling/packing
(operators/packing.py) in a real data pipeline: after near-dup removal the
corpus is scrubbed of evaluation-set overlap, scored for degenerate
repetition, and rebalanced across languages/domains before sharding.

Scale posture:
- Decontamination broadcasts the *evaluation* shingle set (benchmark suites
  are MBs even when the corpus is 100 TB) so the corpus side is a map-side
  hash join — the corpus never shuffles on shingle.
- Repetition stats shuffle once on doc_id (the explode keeps the document
  as the shuffle key, so parallelism is per-document regardless of input
  file layout).
- Temperature sampling aggregates a stratum-cardinality table (bounded:
  languages/domains), broadcasts the per-stratum rate back, and filters
  with a pure deterministic-hash predicate — no RNG, no corpus shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import _tokens, shingle_rows
from .packing import stable_bucket


def ngram_decontaminate(
    corpus: DataFrame,
    eval_df: DataFrame,
    n: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark decontamination by word n-gram overlap (the GPT-3/FineWeb
    discipline: drop or flag training docs sharing n-grams with an eval
    set). Returns one row per *contaminated* corpus doc:
    (id, n_hits, n_grams, hit_ratio) where n_hits counts the doc's distinct
    shingles that appear anywhere in the eval set.

    Real deployments use 8–13-gram overlap; ``n`` is a knob (the synthetic
    corpus has a ~40-word vocabulary, so tests use n=4).

    Plan shape: eval shingles are ``broadcast`` (eval suites are bounded —
    MBs against a 100 TB corpus), so the overlap join is a map-side hash
    join; the only shuffle is the per-doc count aggregation keyed on the
    uniformly-distributed doc id.
    """
    corpus_sh = shingle_rows(corpus, text_col, id_col, n)
    eval_sh = shingle_rows(eval_df, text_col, id_col, n).select("shingle").distinct()
    totals = corpus_sh.groupBy(id_col).agg(F.count("*").alias("n_grams"))
    hits = (
        corpus_sh.join(F.broadcast(eval_sh), "shingle")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_hits"))
    )
    return (
        hits.join(totals, id_col)
        .select(
            id_col,
            "n_hits",
            "n_grams",
            F.round(F.col("n_hits") / F.col("n_grams"), 6).alias("hit_ratio"),
        )
    )


def repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Gopher-style repetition quality signals, per document: total/distinct
    word counts, the most-frequent word and its frequency fraction, and the
    most-frequent word-bigram's fraction of all bigrams. Degenerate
    (looping) generations and boilerplate score high on the top-fraction
    columns and low on distinct_ratio; real pipelines filter on thresholds
    (Gopher: drop if top-2-gram fraction > 0.20).

    Ties for "most frequent" break on the lexicographically smallest
    token — deterministic across engines and runs.

    Plan shape: one explode + two hash aggregations and one row_number
    window, all keyed on doc_id (uniform), all whole-stage-codegen; no
    Python, no driver state. Fractions are int/int double divisions
    (bit-identical across engines). Bigrams are zipped from the token
    ARRAY at explode time (adjacent slices), never via a
    lead()-over-(doc, pos) window: that window shuffles and per-doc-sorts
    EVERY token row, and on a row-size-skewed corpus (one giant document
    = one unsplittable sort task) it was the operator's 100x blowup —
    the giant-doc sweep (tools/scale_check.py --doc-skew) measured the
    window form at 53x between 10x and 100x; the zip form has no
    token-row shuffle at all.
    """
    toks = df.select(
        F.col(id_col), F.explode(_tokens(F.col(text_col))).alias("tok")
    )
    base = toks.groupBy(id_col).agg(
        F.count("*").alias("n_words"),
        F.countDistinct("tok").alias("n_distinct"),
    )

    def _top(rows: DataFrame, val_col: str, out_val: str, out_cnt: str) -> DataFrame:
        cnt = rows.groupBy(id_col, val_col).agg(F.count("*").alias("__c"))
        w = Window.partitionBy(id_col).orderBy(F.desc("__c"), F.asc(val_col))
        return (
            cnt.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select(
                F.col(id_col),
                F.col(val_col).alias(out_val),
                F.col("__c").alias(out_cnt),
            )
        )

    top_word = _top(toks, "tok", "top_word", "__wc")
    bigrams = df.select(
        F.col(id_col), _tokens(F.col(text_col)).alias("t")
    ).select(
        F.col(id_col),
        F.explode(
            F.zip_with(
                F.slice(F.col("t"), 1, F.greatest(F.size("t") - 1, F.lit(0))),
                F.slice(F.col("t"), 2, F.greatest(F.size("t") - 1, F.lit(0))),
                lambda a, b: F.concat_ws(" ", a, b),
            )
        ).alias("bigram"),
    )
    top_bigram = _top(bigrams, "bigram", "top_bigram", "__bc")
    return (
        base.join(top_word, id_col)
        .join(top_bigram, id_col, "left")
        .select(
            id_col,
            "n_words",
            "n_distinct",
            F.round(F.col("n_distinct") / F.col("n_words"), 6).alias("distinct_ratio"),
            "top_word",
            F.round(F.col("__wc") / F.col("n_words"), 6).alias("top_word_frac"),
            "top_bigram",
            F.when(
                F.col("n_words") > 1,
                F.round(F.col("__bc") / (F.col("n_words") - 1), 6),
            ).alias("top_bigram_frac"),
        )
    )


def temperature_sample(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    salt: str = "",
) -> DataFrame:
    """Temperature-based stratum rebalancing at α = 0.5 (the mT5/XLM-R
    multilingual recipe: sample language l with probability ∝ p_l^α, which
    flattens the head and boosts the tail). With acceptance rates scaled so
    the rarest stratum keeps everything, the α = 0.5 rate reduces to

        rate_l = sqrt(cnt_min / cnt_l)

    — a closed form with NO cross-row floating-point sums (the Σ p^α
    normaliser cancels), so the computation is one integer division and one
    correctly-rounded sqrt: bit-identical across engines. Acceptance is the
    repo-standard deterministic sha256 bucket (no RNG; same rows survive on
    any cluster layout). Returns the kept rows plus the stratum's rate.

    Plan shape: one bounded aggregation (strata cardinality — languages or
    domains, a handful of rows), broadcast back, pure column-predicate
    filter. The corpus itself never shuffles.
    """
    counts = df.groupBy(strata_col).agg(F.count("*").alias("__cnt"))
    w = Window.partitionBy()
    rates = counts.select(
        strata_col,
        F.sqrt(F.min("__cnt").over(w) / F.col("__cnt")).alias("sample_rate"),
    )
    mod = 1_000_000
    bucket = stable_bucket(key_col, mod, salt)
    return (
        df.join(F.broadcast(rates), strata_col)
        .filter(bucket < F.floor(F.col("sample_rate") * mod))
        .withColumn("sample_rate", F.round("sample_rate", 6))
    )


# --------------------------------------------------------------------------
# Bloom-prefiltered decontamination (§2.13): when the eval suite outgrows a
# raw-string broadcast, ship a fixed-size bit table instead.
# --------------------------------------------------------------------------

BLOOM_K = 4  # probes per key; ~10 bits/key -> fpp ~1%


def _bloom_positions(col: Column, m_bits: int) -> list[Column]:
    """K bit positions from non-overlapping sha256 hex windows — the same
    engine-portable construction as stable_bucket, K independent slices."""
    h = F.sha2(col, 256)
    return [
        F.conv(F.substring(h, 1 + 8 * i, 8), 16, 10).cast("bigint")
        % F.lit(m_bits)
        for i in range(BLOOM_K)
    ]


def build_ngram_bloom(
    eval_df: DataFrame,
    n: int = 4,
    m_bits: int = 1 << 17,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """1-row DataFrame with a ``bloom`` array<long> column (m_bits/64
    words) over the eval set's distinct n-grams. Fully distributed: k
    position rows per shingle, bit_or-reduced per 64-bit word (map-side
    partials), then one 1-row aggregate densifies the word map — the bit
    table never exists on the driver and rides a broadcast exchange, not a
    plan literal."""
    n_words = m_bits // 64
    sh = shingle_rows(eval_df, text_col, id_col, n).select("shingle").distinct()
    pos = sh.select(
        F.explode(F.array(*_bloom_positions(F.col("shingle"), m_bits))).alias("p")
    )
    words = (
        pos.select(
            (F.col("p") / 64).cast("int").alias("word_idx"),
            F.call_function(
                "shiftleft", F.lit(1).cast("bigint"), (F.col("p") % 64).cast("int")
            ).alias("bit"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("bit").alias("bits"))
    )
    dense = words.agg(
        F.map_from_entries(
            F.collect_list(F.struct("word_idx", "bits"))
        ).alias("m")
    ).select(
        F.expr(
            f"transform(sequence(0, {n_words - 1}), "
            f"i -> coalesce(element_at(m, i), 0L))"
        ).alias("bloom")
    )
    return dense


def bloom_might_contain(
    col: Column, bloom_col: Column, m_bits: int
) -> Column:
    """All-K-bits-set membership test — pure JVM column expression
    (element_at + getbit), no UDF."""
    cond = F.lit(True)
    for p in _bloom_positions(col, m_bits):
        word = F.element_at(bloom_col, (p / 64).cast("int") + 1)
        cond = cond & (
            F.call_function("getbit", word, (p % 64).cast("int")) == 1
        )
    return cond


def bloom_ngram_decontaminate(
    corpus: DataFrame,
    eval_df: DataFrame,
    n: int = 4,
    m_bits: int = 1 << 17,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact decontamination output (identical to
    :func:`ngram_decontaminate`) with a Bloom map-side prefilter.

    Scale rationale: the plain version broadcasts the eval set's RAW
    shingles — fine for MB suites, impossible when the held-out set is
    itself large (e.g. decontaminating against a full validation corpus).
    Here only the fixed-size bit table (m_bits/8 bytes) is broadcast; the
    corpus side drops every shingle the Bloom rejects BEFORE any join, and
    the exact verification join then runs on the tiny candidate remnant
    (shuffle join on the shingle key — AQE sizes it), so false positives
    cannot reach the output. Wrong-by-construction is impossible: Bloom
    has no false negatives, and the verify join removes false positives.
    """
    bloom = build_ngram_bloom(eval_df, n, m_bits, text_col, id_col)
    corpus_sh = shingle_rows(corpus, text_col, id_col, n)
    totals = corpus_sh.groupBy(id_col).agg(F.count("*").alias("n_grams"))
    candidates = corpus_sh.crossJoin(F.broadcast(bloom)).filter(
        bloom_might_contain(F.col("shingle"), F.col("bloom"), m_bits)
    ).drop("bloom")
    eval_sh = shingle_rows(eval_df, text_col, id_col, n).select("shingle").distinct()
    hits = (
        candidates.join(eval_sh, "shingle")  # exact verify: fps die here
        .groupBy(id_col)
        .agg(F.count("*").alias("n_hits"))
    )
    return hits.join(totals, id_col).select(
        id_col,
        "n_hits",
        "n_grams",
        F.round(F.col("n_hits") / F.col("n_grams"), 6).alias("hit_ratio"),
    )
