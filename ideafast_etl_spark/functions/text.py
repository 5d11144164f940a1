"""Text-analysis functions for the LLM-data-pipeline extensions (SURVEY.md §2.13).

All JVM-side column expressions — no Python in the hot path, so these run inside
whole-stage codegen and scale linearly with executors. Semantics are kept
ANSI-SQL-expressible so the DuckDB oracle can replicate them exactly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# A small multilingual stopword inventory for the n-gram-free language-ID
# heuristic: count hits of high-frequency function words per language and pick
# the argmax. Deterministic and SQL-expressible.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is", "in", "that", "it", "was", "for"),
    "de": ("der", "die", "und", "das", "ist", "nicht", "ein", "mit", "sich", "auf"),
    "fr": ("le", "la", "les", "et", "est", "une", "que", "pour", "dans", "pas"),
    "es": ("el", "la", "los", "que", "es", "una", "por", "con", "para", "del"),
}

EN_STOPWORDS = LANG_MARKERS["en"] + ("a", "an", "as", "at", "by", "on", "with")

# BPE-ish tokenizer: word-ish runs, numbers, or single non-space symbols.
# Kept to regex constructs with identical semantics in Java (Spark) and
# RE2/PCRE (DuckDB): no lookarounds, no \p classes.
TOKEN_REGEX = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \\t\\n\\r]"


def norm_text(col: Column | str) -> Column:
    """Normalise for dedup: lowercase, collapse whitespace runs, trim."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), "\\s+", " "))


def char_count(col: Column | str) -> Column:
    return F.length(col)


def word_count(col: Column | str) -> Column:
    """Whitespace token count; empty string → 0."""
    c = F.col(col) if isinstance(col, str) else col
    trimmed = F.trim(c)
    return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, "\\s+"))
    )


def token_count(col: Column | str) -> Column:
    """BPE-ish token count via TOKEN_REGEX (regexp_count is Spark 3.5+)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(TOKEN_REGEX))


def punct_ratio(col: Column | str) -> Column:
    """Punctuation chars / total chars (0 for empty text)."""
    c = F.col(col) if isinstance(col, str) else col
    n_punct = F.regexp_count(c, F.lit("[^A-Za-z0-9 \\t\\n\\r]"))
    return F.when(F.length(c) == 0, F.lit(0.0)).otherwise(
        n_punct.cast("double") / F.length(c).cast("double")
    )


def stopword_hits(col: Column | str, words: tuple[str, ...] = EN_STOPWORDS) -> Column:
    """Count of stopword occurrences (word-bounded, case-insensitive)."""
    c = F.col(col) if isinstance(col, str) else col
    low = F.lower(c)
    pattern = "\\b(" + "|".join(words) + ")\\b"
    return F.regexp_count(low, F.lit(pattern))


def stopword_ratio(col: Column | str, words: tuple[str, ...] = EN_STOPWORDS) -> Column:
    """Stopword hits / whitespace word count (0 when no words)."""
    wc = word_count(col)
    return F.when(wc == 0, F.lit(0.0)).otherwise(
        stopword_hits(col, words).cast("double") / wc.cast("double")
    )


def quality_score(col: Column | str) -> Column:
    """Composite [0,1] quality heuristic: length band + stopword presence −
    punctuation excess. Deterministic; mirrors common LLM-corpus filters
    (length/punct/stopword ratios)."""
    c = F.col(col) if isinstance(col, str) else col
    length_ok = (F.length(c) >= 200) & (F.length(c) <= 20000)
    sw = stopword_ratio(c)
    pr = punct_ratio(c)
    score = (
        F.when(length_ok, F.lit(0.4)).otherwise(F.lit(0.0))
        + F.when(sw > 0.05, F.lit(0.4)).otherwise(sw * 8)
        + F.when(pr < 0.1, F.lit(0.2)).otherwise(
            F.greatest(F.lit(0.0), F.lit(0.2) - (pr - 0.1))
        )
    )
    return F.round(score, 4)


def lang_id(col: Column | str) -> Column:
    """Language-ID heuristic: argmax of per-language marker-word hit counts;
    'und' (undetermined) when no marker hits at all. Ties break by language
    code order (deterministic)."""
    c = F.col(col) if isinstance(col, str) else col
    low = F.lower(c)
    scores = [
        (code, F.regexp_count(low, F.lit("\\b(" + "|".join(words) + ")\\b")))
        for code, words in sorted(LANG_MARKERS.items())
    ]
    total = scores[0][1]
    for _, s in scores[1:]:
        total = total + s
    best = F.lit("und")
    best_score = F.lit(-1)
    # forward (code-sorted) order with strict >: the alphabetically-FIRST
    # code wins ties, matching the docstring and the oracle's CASE order
    for code, s in scores:
        is_better = s > best_score
        best = F.when(is_better, F.lit(code)).otherwise(best)
        best_score = F.when(is_better, s).otherwise(best_score)
    return F.when(total == 0, F.lit("und")).otherwise(best)


def fingerprint64(col: Column | str) -> Column:
    """Document fingerprint: first 16 hex chars of sha256 over normalised text,
    as an unsigned-ish bigint-in-hex string. Stable across engines (DuckDB:
    ``substr(sha256(...), 1, 16)``)."""
    return F.substring(F.sha2(norm_text(col), 256), 1, 16)
