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
    block: Column | None = None,
) -> DataFrame:
    """All unordered pairs (id_a < id_b) within a block whose names are
    within ``max_dist`` Levenshtein edits. Output:
    (id_a, id_b, name_a, name_b, dist).

    Plan: project (block, id, name) → equi-self-join on the block key
    (shuffle on the block hash; skew tracks the largest block, the knob
    documented above) → `levenshtein` filter inside the joined stage.
    A pair is compared once per shared block; a block key derived from one
    expression yields each pair at most once, so no distinct is needed
    with the default key. Multi-key blocking (pass a different `block`
    per call and union) needs a distinct on (id_a, id_b) downstream.
    """
    blk = block if block is not None else first_token_block(F.col(name_col))
    base = df.select(
        blk.alias("__blk"), F.col(id_col).alias("__id"), F.col(name_col).alias("__name")
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
        )
    )
