"""Skew mitigation (SURVEY.md §2.13 100-TB posture: "salting for skewed
dmp_ids"; §4 O12).

AQE's skew-join splitting handles most cases at runtime; these operators are
for the cases AQE can't fix: a *single* hot aggregation key (AQE can't split
one hash-aggregate group) and broadcast-ineligible joins against a skewed
build side.

Pattern: salt → partial aggregate on (key, salt) → final aggregate on key.
Two shuffles, but each partition carries ≤ 1/n_salts of the hot key — the
straggler disappears. Algebra only holds for decomposable aggregates
(count/sum/min/max — the ones the pipeline uses).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int = 16, col_name: str = "_salt") -> DataFrame:
    """Deterministic salt derived from the whole row's uniform hash — no
    rand() so retries/resumes stay reproducible."""
    return df.withColumn(
        col_name, F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    )


def salted_count(
    df: DataFrame, key_cols: list[str], n_salts: int = 16
) -> DataFrame:
    """Two-phase count per key: (key, salt) partial → key final.
    Result identical to ``groupBy(key).count()``; immune to one-hot-key
    stragglers."""
    salted = with_salt(df, n_salts)
    partial = salted.groupBy(*key_cols, "_salt").agg(
        F.count(F.lit(1)).alias("_partial")
    )
    return partial.groupBy(*key_cols).agg(F.sum("_partial").alias("count"))


def salted_sum(
    df: DataFrame, key_cols: list[str], value_col: str, n_salts: int = 16
) -> DataFrame:
    salted = with_salt(df, n_salts)
    partial = salted.groupBy(*key_cols, "_salt").agg(
        F.sum(value_col).alias("_partial")
    )
    return partial.groupBy(*key_cols).agg(F.sum("_partial").alias(f"sum_{value_col}"))


def salted_skew_join(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 16,
) -> DataFrame:
    """Skewed equi-join without broadcast: salt the fact side, replicate the
    dim side across all salts, join on (key, salt). Each of the hot key's
    rows lands in a different partition. Use only when the dim is too big to
    broadcast but much smaller than the facts (replication factor n_salts)."""
    salted_facts = facts.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in facts.columns]), F.lit(n_salts))
    )
    exploded_dim = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return salted_facts.join(exploded_dim, on=[key, "_salt"]).drop("_salt")


def key_skew_report(
    df: DataFrame, key_col: str, top_k: int = 10
) -> DataFrame:
    """Shuffle-key skew diagnosis: the top-k hottest keys with their share
    of all rows and their ratio to a perfectly uniform key. This is the
    observability half of the salting tooling above — run it BEFORE
    choosing n_salts or enabling AQE skew-join thresholds; a hot key with
    ratio 50x means one reducer does 50x the median work.

    Plan: one keyed partial/final count, then the two-phase bounded top-k
    (rank within physical partition first, global rank over the <= k x P
    survivors — operators/ranking.py) so NO single-partition window ever
    sees the full distinct-key relation, which at 100 TB is billions of
    rows. Shares are integer-derived double divisions.
    Output: (rank, key, cnt, share, uniform_ratio).
    """
    from .ranking import bounded_topk_per_group

    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    totals = counts.agg(
        F.sum("cnt").alias("total"), F.count(F.lit(1)).alias("nkeys")
    )
    top = bounded_topk_per_group(
        counts, [], [F.col("cnt").desc(), F.col("key").asc()], top_k
    )
    return top.crossJoin(F.broadcast(totals)).select(
        "rank",
        F.col("key").cast("string").alias("key"),
        "cnt",
        F.round(F.col("cnt").cast("double") / F.col("total").cast("double"), 6).alias(
            "share"
        ),
        F.round(
            F.col("cnt").cast("double") * F.col("nkeys").cast("double")
            / F.col("total").cast("double"),
            6,
        ).alias("uniform_ratio"),
    )
