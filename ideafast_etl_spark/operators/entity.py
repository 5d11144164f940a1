"""Entity resolution: blocked fuzzy (edit-distance) self-join.

Classic record-linkage shape for catalog/name dedup — the all-pairs
Levenshtein comparison is O(n²) and never survives scale, so candidate
pairs come from *blocking*: only records sharing a cheap deterministic
block key are compared. With block key b, cost is Σ|block_b|² — tunable
by block granularity (first token → first token + length band → phonetic
key) exactly like MinHash banding tunes recall/cost for documents
(operators/dedup.py). Levenshtein itself is a JVM built-in
(``F.levenshtein``) so the verify stage whole-stage-codegens; no UDFs.

The reference compares records only by exact hash (J1/X1,
ideafast_etl/hooks/db.py:49-55); this is the approximate counterpart for
human-keyed identifiers (patient names, device labels) where exact
hashing misses typos.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def first_token_block(name: Column, length_band: int | None = 4) -> Column:
    """Default block key: first whitespace token, optionally concatenated
    with the name-length band (``len div length_band``) — the band splits
    giant token blocks and cheaply prunes pairs whose lengths already
    differ by more than the edit-distance budget."""
    tok = F.split(name, " ")[0]
    if length_band is None:
        return tok
    # floor division on both sides: DuckDB CAST(double AS INT) *rounds*,
    # so the oracle uses `//` and Spark uses floor — not a double cast
    band = F.floor(F.length(name) / F.lit(length_band)).cast("int")
    return F.concat_ws("#", tok, band.cast("string"))


def blocked_fuzzy_pairs(
    df: DataFrame,
    name_col: str,
    id_col: str,
    max_dist: int = 4,
    block=None,
) -> DataFrame:
    """All unordered pairs of DISTINCT names within ``max_dist``
    Levenshtein edits of each other, sharing a block. Output:
    (id_a, id_b, name_a, name_b, dist, n_a, n_b) — ids are each name
    group's min id, n_* its exact-duplicate multiplicity.

    Exact duplicates are collapsed FIRST (keyed min/count aggregation —
    map-side combine, no pairwise work): a catalog where one name repeats
    m times would otherwise emit C(m,2) identical-pair rows, making the
    output quadratic in duplicate-group size — the 10x scale harness
    measured 1.04e9 rows / 132 s before this collapse and 74 rows / 8.8 s
    after (TPC-H part names repeat heavily even at one SF, so the
    pre-collapse number was pathological at EVERY scale, not just 10x).
    Exact-dup resolution itself is the cheap hash pass
    (operators/dedup.py::exact_dedup); this operator's job is only the
    fuzzy frontier between distinct spellings.

    Plan: collapse → project (block, name, rep id, count) → equi-self-
    join on the block key (skew tracks the largest block — the blocking
    granularity knob documented above) → `levenshtein` filter inside the
    joined stage. A pair is compared once per shared block; the single
    block expression yields each pair at most once, so no distinct is
    needed. ``block`` is a function Column -> Column applied to the name
    (default ``first_token_block``); multi-key blocking (union of calls
    with different block functions) needs a distinct on (id_a, id_b)
    downstream.
    """
    block_fn = block if block is not None else first_token_block
    groups = df.groupBy(F.col(name_col).alias("__name")).agg(
        F.min(id_col).alias("__id"), F.count(F.lit(1)).alias("__n")
    )
    base = groups.select(
        block_fn(F.col("__name")).alias("__blk"), "__id", "__name", "__n"
    )
    left = base.alias("l")
    right = base.alias("r")
    # long, not int: DuckDB levenshtein returns BIGINT and the
    # differential compare is dtype-sensitive
    dist = F.levenshtein(F.col("l.__name"), F.col("r.__name")).cast("long")
    return (
        left.join(
            right,
            (F.col("l.__blk") == F.col("r.__blk"))
            & (F.col("l.__id") < F.col("r.__id")),
        )
        .withColumn("dist", dist)
        .filter(F.col("dist") <= max_dist)
        .select(
            F.col("l.__id").alias("id_a"),
            F.col("r.__id").alias("id_b"),
            F.col("l.__name").alias("name_a"),
            F.col("r.__name").alias("name_b"),
            "dist",
            F.col("l.__n").alias("n_a"),
            F.col("r.__n").alias("n_b"),
        )
    )
