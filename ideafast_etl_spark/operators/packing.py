"""Training-data management operators (SURVEY.md §2.13 extensions): the
corpus-to-training-run plumbing an LLM pipeline needs between "deduped
documents" and "tokenized shards" — deterministic sampling, reproducible
shard assignment/shuffle order, and sequence packing into context windows.

Everything is keyed on sha256-derived buckets (the repo-wide stable-hash
recipe, see operators/dedup.py:122): deterministic across engines, runs and
cluster sizes — a re-run of the same corpus produces byte-identical splits,
which is what makes training jobs reproducible and resumable.

Scale posture: sampling and sharding are pure column expressions (no
shuffle for the filter; one shuffle on shard id for manifests). Packing is
an inherently sequential fold *within* an ordered group, so the group is
the parallelism unit: real pipelines pack per (stratum, shard) — thousands
of independent groups — which applyInPandas distributes with a single
shuffle; no state crosses group boundaries by construction.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def stable_bucket(col: Column | str, modulus: int, salt: str = "") -> Column:
    """Deterministic bucket in [0, modulus): first 60 bits of
    sha256(value ‖ salt) mod modulus. Uniform, engine-portable (DuckDB
    twin: ``('0x' || substr(sha256(v || salt), 1, 15))::BIGINT % m``) and
    stable across Spark versions — unlike ``F.hash`` (Murmur3, seed- and
    version-dependent), safe to persist in manifests."""
    c = F.col(col) if isinstance(col, str) else col
    h = F.sha2(F.concat(c.cast("string"), F.lit(salt)), 256)
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("bigint") % modulus


def weighted_sample(
    df: DataFrame,
    weight: Column,
    k: int,
    id_col: str = "doc_id",
    salt: str = "ws0",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis &
    Spirakis 2006): each row draws u ∈ (0,1] and the k rows minimizing
    (−ln u)/w are the sample — inclusion probability proportional to
    weight, no replacement, one pass. The core mixing primitive for
    quality-weighted corpus selection.

    Determinism discipline (REPRO.md patterns 7/8): u is sha256-derived
    (top 60 bits of sha256(id‖salt), +1, over 2^60 — exact dyadic
    double), −ln(u) is QUANTIZED to integer micro-units before the
    division (ln is engine-faithful only; the quantized long absorbs the
    last-ulp divergence), and the weight is quantized the same way — the
    sort key is then one IEEE division of two exact integers, identical
    in any engine. Selection is the distributed ``global_rank`` (no
    single-partition window); ties break by id.

    Weight domain (r7 ADVICE): rows with weight <= 0 are EXCLUDED before
    keying — zero weight means zero inclusion probability under E-S, and
    a negative weight is undefined (the old null-safe divide silently
    produced NULL es_key for both, nondeterministically ordered vs the
    oracle). Positive weights below the 1e-6 quantum are floored to one
    micro-unit (the oracle's ``GREATEST(wq, 1)``), so sub-quantum weights
    rank deterministically instead of dividing by zero.

    Returns (id, weight, es_key, rank) for the k sampled rows."""
    from .ranking import global_rank

    c = F.col(id_col)
    h = F.sha2(F.concat(c.cast("string"), F.lit(salt)), 256)
    hv = F.conv(F.substring(h, 1, 15), 16, 10).cast("bigint")
    u = (hv + F.lit(1)).cast("double") / F.lit(float(1 << 60))
    lq = F.round(-F.log(u) * F.lit(1_000_000.0)).cast("long")
    wq = F.greatest(
        F.round(weight.cast("double") * F.lit(1_000_000.0)).cast("long"),
        F.lit(1).cast("long"),
    )
    keyed = df.filter(weight.cast("double") > 0).select(
        c,
        weight.cast("double").alias("weight"),
        (lq.cast("double") / wq.cast("double")).alias("es_key"),
    )
    ranked = global_rank(
        keyed, [F.col("es_key").asc(), c.asc()], rank_col="rank"
    )
    return ranked.filter(F.col("rank") <= k).select(
        id_col, "weight", F.round("es_key", 6).alias("es_key"),
        F.col("rank").cast("int").alias("rank"),
    )


def leakage_safe_splits(
    docs: DataFrame,
    clusters: DataFrame,
    id_col: str = "doc_id",
    cluster_col: str = "cluster_id",
    modulus: int = 100,
    bounds: tuple[int, int] = (80, 90),
    salt: str = "split0",
) -> DataFrame:
    """Train/val/test assignment that cannot leak near-duplicates across
    splits: every document inherits the split of its near-dup CLUSTER
    representative (component min id from ``near_dup_clusters``), so a
    paraphrase/boilerplate twin of a training doc can never land in eval
    (the contamination mode Lee et al. 2022 measure). Documents in no
    cluster are their own representative. The bucket is the same
    engine-portable sha256 rule as ``dataset_splits`` — persisted
    manifests stay valid across engines and Spark versions.

    Plan: one left equi-join (doc → cluster label, data-sized both sides,
    shuffle on the uniform id) + a pure column expression. Returns
    (id, rep, split) per document."""
    rep = (
        docs.select(id_col)
        .join(clusters, id_col, "left")
        .withColumn("rep", F.coalesce(F.col(cluster_col), F.col(id_col)))
    )
    b = stable_bucket("rep", modulus, salt=salt)
    split = (
        F.when(b < bounds[0], F.lit("train"))
        .when(b < bounds[1], F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return rep.select(id_col, "rep", split.alias("split"))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    key_col: str,
    default_rate: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Deterministic per-stratum sampling: keep a row iff its key's hash
    bucket (out of 10 000) falls below the stratum's rate. Unlike
    ``DataFrame.sampleBy`` (seeded RNG over partition order) this is a pure
    column predicate — no shuffle, reproducible across engines/cluster
    layouts, and the SAME rows are kept when the corpus is re-read with
    different partitioning. Rates are per-stratum fractions (0.25 keeps
    bucket < 2500)."""
    bucket = stable_bucket(key_col, 10_000, salt)
    rate_expr = F.lit(int(default_rate * 10_000))
    for stratum, rate in sorted(rates.items()):
        rate_expr = F.when(
            F.col(strata_col) == stratum, F.lit(int(rate * 10_000))
        ).otherwise(rate_expr)
    return df.filter(bucket < rate_expr)


def assign_shards(
    df: DataFrame,
    n_shards: int,
    key_col: str,
    seed: str = "",
) -> DataFrame:
    """Reproducible shard assignment + within-shard shuffle order: shard =
    hash bucket of the key, ``shuffle_pos`` = rank of a second, independent
    hash within the shard. Writing ordered by (shard_id, shuffle_pos)
    yields the canonical deterministic training shuffle — re-running on any
    cluster reproduces the same order. One shuffle (the window on
    shard_id); at the real scale this is ``repartition(shard_id)`` +
    ``sortWithinPartitions`` feeding a partitioned write."""
    from pyspark.sql import Window

    shard = stable_bucket(key_col, n_shards, seed + "|shard")
    order_key = stable_bucket(key_col, (1 << 60) - 1, seed + "|order")
    w = Window.partitionBy("shard_id").orderBy("order_key", key_col)
    return (
        df.withColumn("shard_id", shard)
        .withColumn("order_key", order_key)
        .withColumn("shuffle_pos", F.row_number().over(w).cast("long") - 1)
        .drop("order_key")
    )


def pack_sequences(
    df: DataFrame,
    cap: int,
    group_cols: Iterable[str],
    order_col: str,
    token_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Next-fit sequence packing: within each group (ordered by
    ``order_col``) documents are folded left-to-right into bins of at most
    ``cap`` tokens — when a document no longer fits, a new bin opens; a
    document larger than ``cap`` occupies a bin alone. Emits (id, group
    cols, tokens, bin_id, bin_pos).

    Packing is a sequential fold, so the GROUP is the parallelism unit
    (pack per (stratum, shard) for thousands of independent groups);
    applyInPandas distributes them with one shuffle. Next-fit is the
    streaming-friendly packing discipline — O(n), order-respecting (keeps
    curriculum/shuffle order, unlike first-fit-decreasing), and ≥ 1/2
    optimal bin utilisation by the classic bound."""
    group_cols = list(group_cols)
    out_schema = ", ".join(
        [f"{id_col} long"]
        + [f"{g} string" for g in group_cols]
        + [f"{token_col} long", "bin_id long", "bin_pos long"]
    )

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="mergesort")
        bins, poss = [], []
        bin_id, bin_pos, cur = 0, 0, 0
        first = True
        for t in pdf[token_col].astype("int64"):
            if first:
                bin_id, bin_pos, cur = 0, 0, int(t)
                first = False
            elif cur + t > cap:
                bin_id, bin_pos, cur = bin_id + 1, 0, int(t)
            else:
                bin_pos, cur = bin_pos + 1, cur + int(t)
            bins.append(bin_id)
            poss.append(bin_pos)
        out = pdf[[id_col, *group_cols, token_col]].copy()
        out["bin_id"] = bins
        out["bin_pos"] = poss
        return out

    cols = [id_col, *group_cols, order_col, token_col]
    return (
        df.select(*dict.fromkeys(cols))
        .groupBy(*group_cols)
        .applyInPandas(_pack, schema=out_schema)
    )
