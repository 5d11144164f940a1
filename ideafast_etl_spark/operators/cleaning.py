"""Corpus-cleaning heuristics for LLM pretraining pipelines.

Implements the classic published rule sets over a ``documents(doc_id, text)``
table, all as JVM column expressions (whole-stage codegen, no Python in the
hot path) so they scale linearly with executors at 100 TB:

  - **Gopher quality rules** (Rae et al. 2021, appendix A1.1): word-count
    bounds, mean word length, symbol-to-word ratio, bullet/ellipsis line
    fractions, alphabetic-word fraction, required-stopword hits.
  - **C4 line-level cleaning** (Raffel et al. 2020 §2.2): keep lines ending
    in terminal punctuation with >= 5 words, drop javascript/brace lines,
    flag documents with < 3 retained lines or "lorem ipsum".
  - **PII redaction**: email / IPv4 / SSN / phone regex redaction with
    per-category counts (the pre-release scrub every corpus gets).
  - **Cross-document line dedup** (C4's "discard repeated lines" pass):
    global first-occurrence wins, implemented as a line-hash shuffle — the
    only shuffle key is the line content, so it scales as an equi-join.
  - **Sliding-window chunking** (RAG / context-window packing): fixed-size
    word windows with overlap, derived via ``sequence`` + ``slice`` —
    no UDFs, no explode-then-window.

Every rule keeps to regex constructs with identical semantics in Java
(Spark) and RE2 (DuckDB) — no lookarounds — so the differential oracle in
:mod:`ideafast_etl_spark.oracles` can replicate them exactly.

Reference analog: the lifecycle filter rungs F1-F7
(``/root/reference/ideafast_etl/utils/db.py:61-109``) are the same
shape — predicate columns over a record table deciding what advances;
these are the corpus-scale equivalents.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# --- Gopher rule constants (Rae et al. 2021, A1.1) -------------------------

GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 3.0
GOPHER_MAX_MEAN_WORD_LEN = 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_MAX_BULLET_FRAC = 0.9
GOPHER_MAX_ELLIPSIS_FRAC = 0.3
GOPHER_MIN_ALPHA_FRAC = 0.8
GOPHER_MIN_STOP_HITS = 2
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")

# Regexes shared verbatim with the oracle (Java & RE2 compatible).
SYMBOL_RE = "[#]|[.][.][.]"
BULLET_RE = "^[ \\t]*[-*\u2022]"
ELLIPSIS_END_RE = "([.][.][.]|\u2026)[ \\t]*$"
TERMINAL_LINE_RE = '[.!?]"?[ \\t]*$'

# --- PII patterns (applied in this order; identical in both engines) -------

PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+", "<EMAIL>"),
    ("ip", r"\b[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}\b", "<IP>"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<SSN>"),
    ("phone", r"\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b", "<PHONE>"),
)

CHUNK_SIZE = 64
CHUNK_STRIDE = 48


def _words(col: Column) -> Column:
    """Whitespace-split word array; empty array for blank text."""
    return F.when(
        F.length(F.trim(col)) == 0, F.array().cast("array<string>")
    ).otherwise(F.split(F.trim(col), r"\s+"))


def _lines(col: Column) -> Column:
    return F.split(col, "\n")


def gopher_signals(col: Column) -> dict[str, Column]:
    """The seven Gopher document-quality signals as named columns.

    All ratios are double divisions of integer counts (bit-identical across
    engines); blank documents get 0 for every ratio and ``keep = false``.
    """
    words = _words(col)
    n_words = F.size(words)
    nz = n_words > 0
    non_ws_chars = F.length(F.regexp_replace(col, r"\s+", ""))
    mean_wl = F.when(nz, non_ws_chars.cast("double") / n_words.cast("double")).otherwise(F.lit(0.0))
    n_symbols = F.size(F.regexp_extract_all(col, F.lit(SYMBOL_RE), 0))
    symbol_ratio = F.when(nz, n_symbols.cast("double") / n_words.cast("double")).otherwise(F.lit(0.0))
    lines = _lines(col)
    n_lines = F.size(lines)  # split never returns an empty array
    bullet_frac = (
        F.size(F.filter(lines, lambda l: l.rlike(BULLET_RE))).cast("double")
        / n_lines.cast("double")
    )
    ellipsis_frac = (
        F.size(F.filter(lines, lambda l: l.rlike(ELLIPSIS_END_RE))).cast("double")
        / n_lines.cast("double")
    )
    n_alpha_words = F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]")))
    alpha_frac = F.when(nz, n_alpha_words.cast("double") / n_words.cast("double")).otherwise(F.lit(0.0))
    low = F.lower(col)
    stop_hits = sum(
        (
            F.when(low.rlike(r"\b" + w + r"\b"), F.lit(1)).otherwise(F.lit(0))
            for w in GOPHER_STOPWORDS
        ),
        start=F.lit(0),
    )
    return {
        "words": n_words.cast("long"),
        "mean_word_len": F.round(mean_wl, 6),
        "symbol_ratio": F.round(symbol_ratio, 6),
        "bullet_frac": F.round(bullet_frac, 6),
        "ellipsis_frac": F.round(ellipsis_frac, 6),
        "alpha_frac": F.round(alpha_frac, 6),
        "stop_hits": stop_hits.cast("long"),
    }


def gopher_keep(sig: dict[str, Column]) -> Column:
    """Conjunction of the Gopher keep rules over :func:`gopher_signals`."""
    return (
        sig["words"].between(GOPHER_MIN_WORDS, GOPHER_MAX_WORDS)
        & sig["mean_word_len"].between(GOPHER_MIN_MEAN_WORD_LEN, GOPHER_MAX_MEAN_WORD_LEN)
        & (sig["symbol_ratio"] <= GOPHER_MAX_SYMBOL_RATIO)
        & (sig["bullet_frac"] <= GOPHER_MAX_BULLET_FRAC)
        & (sig["ellipsis_frac"] <= GOPHER_MAX_ELLIPSIS_FRAC)
        & (sig["alpha_frac"] >= GOPHER_MIN_ALPHA_FRAC)
        & (sig["stop_hits"] >= GOPHER_MIN_STOP_HITS)
    )


def gopher_quality(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document Gopher signals + keep flag. Pure projection — no shuffle."""
    sig = gopher_signals(F.col(text_col))
    return docs.select(
        "doc_id",
        *[c.alias(n) for n, c in sig.items()],
        gopher_keep(sig).alias("keep"),
    )


def _c4_line_keep(l: Column) -> Column:
    """C4 per-line retention predicate (Raffel et al. 2020 §2.2)."""
    t = F.trim(l)
    return (
        l.rlike(TERMINAL_LINE_RE)
        & (F.length(t) > 0)
        & (F.size(F.split(t, r"\s+")) >= 5)
        & ~F.lower(l).contains("javascript")
        & ~l.contains("{")
    )


def c4_clean(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """C4 line-level cleaning: per-doc retained-line count, cleaned-text md5,
    and the document-level keep flag (>= 3 retained lines, no "lorem ipsum").

    Pure projection over array higher-order functions — zero shuffles; the
    cleaned text never leaves the executor unless the caller selects it.
    """
    col = F.col(text_col)
    kept = F.filter(_lines(col), _c4_line_keep)
    return docs.select(
        "doc_id",
        F.size(_lines(col)).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept"),
        F.md5(F.array_join(kept, "\n")).alias("clean_md5"),
        (
            (F.size(kept) >= 3) & ~F.lower(col).contains("lorem ipsum")
        ).alias("keep_doc"),
    )


def pii_redact_col(col: Column) -> Column:
    """Chained regex redaction in the fixed PII_PATTERNS order."""
    out = col
    for _, pat, token in PII_PATTERNS:
        out = F.regexp_replace(out, pat, token)
    return out


def pii_redaction(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document PII counts (on the original text) + redacted-text md5.

    Counts are computed before redaction so categories don't mask each other;
    the replacement chain is order-fixed so both engines produce the same
    redacted bytes. Pure projection — no shuffle, no UDFs.
    """
    col = F.col(text_col)
    counts = [
        F.size(F.regexp_extract_all(col, F.lit(pat), 0)).cast("long").alias(f"n_{name}")
        for name, pat, _ in PII_PATTERNS
    ]
    return docs.select("doc_id", *counts, F.md5(pii_redact_col(col)).alias("redacted_md5"))


def line_dedup(
    docs: DataFrame, text_col: str = "text", with_text: bool = False
) -> DataFrame:
    """C4-style cross-document line dedup: a line that appears in multiple
    documents is kept only at its first global occurrence (ordered by
    ``(doc_id, position)``); blank lines are never deduped (they would be a
    degenerate hot key — a single shuffle partition receiving every empty
    line in a 100 TB corpus).

    Plan shape: posexplode -> [blank lines bypass] -> ``groupBy(line)`` with
    a ``min(struct(doc_id, pos))`` aggregate (struct comparison is
    lexicographic by field order, so the min IS the first global occurrence)
    -> re-group by doc_id. Two shuffles total. The keyed *aggregation* —
    not a row_number window — is what survives boilerplate skew: common
    lines ('Home', copyright footers, nav text) are exactly what C4 dedup
    targets, and a window partitioned by content would funnel each such
    line's millions of copies into a single task. Partial (map-side)
    aggregation collapses every copy within a task to one candidate row
    before the shuffle, so the hot key crosses the wire once per upstream
    partition. Documents whose every line is a duplicate disappear from
    the output (same as the oracle's GROUP BY over kept rows).
    """
    lines = docs.select(
        "doc_id", F.posexplode(_lines(F.col(text_col))).alias("pos", "line")
    )
    blank = F.length(F.trim(F.col("line"))) == 0
    first = F.min(F.struct("doc_id", "pos")).alias("__first")
    nonblank_kept = (
        lines.filter(~blank)
        .groupBy("line")
        .agg(first)
        .select(
            F.col("__first.doc_id").alias("doc_id"),
            F.col("__first.pos").alias("pos"),
            "line",
        )
    )
    kept = lines.filter(blank).unionByName(nonblank_kept)
    return (
        kept.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "line"))),
                    lambda s: s["line"],
                ),
                "\n",
            ).alias("__text"),
        )
        .select(
            "doc_id",
            "n_kept",
            F.md5("__text").alias("text_md5"),
            *([F.col("__text").alias("text")] if with_text else []),
        )
    )


def doc_chunks(
    docs: DataFrame,
    text_col: str = "text",
    size: int = CHUNK_SIZE,
    stride: int = CHUNK_STRIDE,
) -> DataFrame:
    """Sliding-window chunking for RAG / context packing: fixed ``size``-word
    windows every ``stride`` words (overlap = size - stride). Derived with
    ``sequence`` + ``slice`` array expressions — the explode happens *after*
    the per-doc window starts are computed, so there is no shuffle at all;
    chunking is embarrassingly parallel over document partitions.
    """
    col = F.col(text_col)
    words = _words(col)
    n = F.size(words)
    starts = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(stride))
    return (
        docs.select("doc_id", words.alias("__w"), n.alias("__n"), starts.alias("__s"))
        .filter(F.col("__n") > 0)
        .select("doc_id", "__w", "__n", F.explode("__s").alias("start"))
        .select(
            "doc_id",
            (F.col("start") / stride).cast("long").alias("chunk_id"),
            F.least(F.lit(size), F.col("__n") - F.col("start")).cast("long").alias("n_words"),
            F.md5(
                F.array_join(F.slice(F.col("__w"), F.col("start") + 1, size), " ")
            ).alias("chunk_md5"),
        )
    )


def char_entropy(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Character-distribution Shannon entropy per document — the
    compression-style quality signal (low entropy = repetitive/degenerate
    text, the RefinedWeb/MassiveText heuristic family).

    Determinism: each histogram term ``p·log2(p)`` quantises to a 1e-6
    fixed-point long BEFORE summation (REPRO.md patterns 1/7), so the
    cross-row sum is an order-free exact integer — no float fold, no
    sort, bit-identical under any partitioning and in the SQL oracle.

    Plan: one (doc, char) hash agg + a doc-partitioned window + one
    doc-keyed agg — two shuffles on uniform keys, all JVM.
    """
    chars = docs.select(
        "doc_id", F.explode(F.split(F.col(text_col), "")).alias("ch")
    )
    hist = chars.groupBy("doc_id", "ch").agg(F.count(F.lit(1)).alias("cnt"))
    n = F.sum("cnt").over(Window.partitionBy("doc_id"))
    p = F.col("cnt").cast("double") / n.cast("double")
    term = F.round(p * F.log2(p) * F.lit(1_000_000.0)).cast("long")
    return (
        hist.withColumn("term", term)
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("n_chars"),
            F.count(F.lit(1)).alias("uniq_chars"),
            F.round(
                -F.sum("term").cast("double") / F.lit(1_000_000.0), 6
            ).alias("entropy"),
        )
    )
