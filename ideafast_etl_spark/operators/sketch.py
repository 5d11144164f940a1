"""Count-min-sketch heavy hitters (§2.13 extension): find frequent keys in a
massive stream/corpus WITHOUT a full-cardinality exact aggregation first.

The 100 TB problem: ``GROUP BY token HAVING count >= T`` over a web-scale
corpus shuffles EVERY distinct token (billions of groups) to compute counts
that are then almost all thrown away. The classic fix (Cormode & Muthukrishnan
2005) is a two-pass sketch-then-verify:

1. **Sketch pass** — build a depth x width count-min sketch. Each row
   increments ``depth`` counters ``(d, xxhash64(key, d) % width)``. In Spark
   this is an explode(depth) + groupBy((d, bucket)).count(): the map-side
   partial aggregate collapses each task's contribution to at most
   ``depth * width`` rows, so the shuffle moves O(depth * width) data per
   task REGARDLESS of input size or key cardinality — the whole point.
2. **Densify** — pivot the sparse (d, bucket, cnt) rows into one row holding
   an array-of-arrays (depth outer, width inner). Bounded: depth*width
   counters (default 4 x 8192 = 32k longs ~ 256 KB), well under broadcast
   limits. Attached to the data via ``crossJoin(broadcast(1 row))`` — a
   1-row BroadcastNestedLoopJoin, i.e. a constant, not a scale concern.
3. **Verify pass** — re-scan, estimate each row's key frequency as
   ``min_d sketch[d][h_d(key)]`` (O(1) array indexing, pure codegen), and
   drop rows whose estimate is below the threshold MAP-SIDE. Only surviving
   rows (true heavy hitters + bounded hash-collision false positives) enter
   the exact groupBy. CMS never underestimates, so no true heavy hitter is
   lost — the final exact count + HAVING filter makes the OUTPUT EXACT,
   which is what lets a plain ``GROUP BY ... HAVING`` oracle verify it.

Same accelerate-with-sketch / verify-exactly shape as the MinHash/LSH
near-dup path (operators/dedup.py): the approximation only prunes work,
never decides the answer.

Reference parity note: the reference engine has no sketch operators; this is
part of the LLM-scale extension surface (corpus-level frequent-token /
stopword discovery, vocab heavy hitters for tokenizer training).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _bucket(key: Column, d: int, width: int) -> Column:
    """Row's counter index for hash function ``d``: xxhash64 seeded by the
    depth index gives ``depth`` independent hash functions; pmod folds the
    signed 64-bit hash into [0, width)."""
    return F.pmod(F.xxhash64(key, F.lit(d)), F.lit(width)).cast("int")


def count_min_sketch(
    keys: DataFrame, key_col: str, depth: int = 4, width: int = 8192
) -> DataFrame:
    """Build the sketch: a ONE-ROW DataFrame with column ``cms`` =
    array<array<long>> (outer index = depth, inner = bucket; dense, zeros
    for untouched buckets) plus ``total`` = total row count (= the exact
    sum of any depth row — used for relative thresholds).

    Shuffle cost: map-side partial agg bounds each task's output at
    depth*width rows; the final single-group densify moves <= depth*width
    rows — both independent of input size."""
    k = F.col(key_col)
    pairs = keys.select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(d).alias("d"), _bucket(k, d, width).alias("bucket")
                )
                for d in range(depth)
            ])
        ).alias("e")
    ).select("e.d", "e.bucket")
    counts = pairs.groupBy("d", "bucket").agg(F.count(F.lit(1)).alias("cnt"))
    per_depth = counts.groupBy("d").agg(
        F.map_from_arrays(
            F.collect_list("bucket"), F.collect_list("cnt")
        ).alias("m")
    )
    dense = per_depth.select(
        "d",
        F.transform(
            F.sequence(F.lit(0), F.lit(width - 1)),
            lambda i: F.coalesce(F.element_at("m", i), F.lit(0).cast("long")),
        ).alias("row"),
    )
    return dense.groupBy().agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("d", "row"))),
            lambda s: s["row"],
        ).alias("cms"),
    ).withColumn(
        # every depth row counts each input exactly once; sum depth 0
        # (try_element_at: an empty input yields an empty cms array)
        "total",
        F.coalesce(
            F.aggregate(
                F.try_element_at("cms", F.lit(1)),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ),
            F.lit(0).cast("long"),
        ),
    )


def cms_estimate(key: Column, depth: int, width: int) -> Column:
    """Point estimate ``min_d cms[d][h_d(key)]`` against the broadcast
    ``cms`` column (1-based element_at; pure codegen array indexing)."""
    return F.least(*[
        F.try_element_at(
            F.try_element_at("cms", F.lit(d + 1)), _bucket(key, d, width) + 1
        )
        for d in range(depth)
    ])


def heavy_hitters(
    keys: DataFrame,
    key_col: str,
    inv_phi: int = 500,
    depth: int = 4,
    width: int = 8192,
) -> DataFrame:
    """EXACT frequent-key table: every key occurring at least ``total /
    inv_phi`` times (phi = 1/inv_phi relative threshold), with its exact
    count. Two passes over ``keys`` (sketch, verify) — the sketch prunes the
    exact aggregation to candidate rows map-side; the integer threshold
    comparison ``freq * inv_phi >= total`` is exact in any engine.

    Returns (key_col, freq) — identical to the output of
    ``GROUP BY key HAVING count(*) * inv_phi >= total``, at a fraction of
    the shuffle when key cardinality is huge."""
    sk = count_min_sketch(keys, key_col, depth=depth, width=width)
    k = F.col(key_col)
    candidates = (
        keys.crossJoin(F.broadcast(sk))
        # map-side prune: CMS overestimates only, so every true heavy
        # hitter survives; collisions add a bounded set of false
        # positives removed by the exact HAVING below
        .filter(cms_estimate(k, depth, width) * inv_phi >= F.col("total"))
    )
    return (
        candidates.groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("freq"), F.first("total").alias("__t"))
        .filter(F.col("freq") * inv_phi >= F.col("__t"))
        .drop("__t")
    )


# --- KMV (k-minimum-values) distinct sketch --------------------------------

KMV_K = 256


def kmv_distinct(
    df: DataFrame,
    key: Column | str,
    k: int = KMV_K,
    group_col: str | None = None,
) -> DataFrame:
    """KMV / bottom-k cardinality sketch (Bar-Yossef et al. 2002; the
    theta-sketch family): hash every key with sha256, keep the k smallest
    DISTINCT hash values, estimate distinct = (k-1) / h_k where h_k is the
    k-th smallest hash normalised to (0, 1).

    Unlike HLL, this is engine-independent arithmetic on sha256 values —
    deterministic, mergeable (union of bottom-k sets → bottom-k), and
    EXACTLY replayable by the SQL oracle. When fewer than k distinct keys
    exist the sketch degenerates to the exact count.

    Scale shape: distinct → per-group bottom-k. Ungrouped, the bottom-k is
    ``ORDER BY hash LIMIT k`` which compiles to TakeOrderedAndProject — a
    per-partition partial top-k, only k rows ever reach the driver side of
    the exchange. Grouped, it is a window row_number bounded by the group
    key. Output: (group?, n_seen_k, est_distinct).
    """
    keyc = F.col(key) if isinstance(key, str) else key
    # uniform in (0, 1]: first 15 hex chars -> 60-bit integer, +1 so 0 is
    # excluded (division by h_k is then always defined)
    h = (
        F.conv(F.substring(F.sha2(keyc.cast("string"), 256), 1, 15), 16, 10)
        .cast("long")
        + 1
    )
    scale = float(1 << 60)
    if group_col is None:
        bottom = df.select(h.alias("h")).distinct().orderBy("h").limit(k)
        return bottom.agg(
            F.count(F.lit(1)).alias("n_seen_k"),
            F.round(
                F.when(
                    F.count(F.lit(1)) < k,
                    F.count(F.lit(1)).cast("double"),
                ).otherwise(
                    (F.lit(float(k - 1)))
                    / (F.max("h").cast("double") / F.lit(scale))
                ),
                4,
            ).alias("est_distinct"),
        )
    bottom = _bottom_k(
        df.select(F.col(group_col), h.alias("h")).distinct(), [group_col], k
    )
    return (
        bottom.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n_seen_k"),
            F.round(
                F.when(
                    F.count(F.lit(1)) < k, F.count(F.lit(1)).cast("double")
                ).otherwise(
                    F.lit(float(k - 1))
                    / (F.max("h").cast("double") / F.lit(scale))
                ),
                4,
            ).alias("est_distinct"),
        )
    )


def _bottom_k(hashes: DataFrame, group_cols: list[str], k: int) -> DataFrame:
    """Two-phase bottom-k per group: per-(group, physical-partition) prune
    to k rows first (window bounded by the PARTITION size, not the group
    size), then the final rank over at most k x n_partitions survivors.
    Result is identical to a direct per-group rank — any global bottom-k
    element is in its partition's bottom-k — but no stage ever sorts a
    whole group in one task. Adds ``rn`` (1-based rank within group)."""
    pre = (
        hashes.withColumn("__pid", F.spark_partition_id())
        .withColumn(
            "__prn",
            F.row_number().over(
                Window.partitionBy(*group_cols, "__pid").orderBy("h")
            ),
        )
        .filter(F.col("__prn") <= k)
        .drop("__pid", "__prn")
    )
    return pre.withColumn(
        "rn",
        F.row_number().over(Window.partitionBy(*group_cols).orderBy("h")),
    ).filter(F.col("rn") <= k)


def kmv_set_ops(
    df: DataFrame,
    key: Column | str,
    label: Column | str,
    label_a: str,
    label_b: str,
    k: int = KMV_K,
) -> DataFrame:
    """Theta-sketch-style set operations on two KMV sketches: estimate
    |A|, |B|, |A∪B| and |A∩B| for the key-sets of two label values,
    WITHOUT an exact distinct join. Method (theta-sketch union/intersect,
    Dasgupta et al. 2016): θ = min(θ_A, θ_B) where θ_X is the k-th
    smallest distinct hash of X (or the max-hash sentinel when |X| < k);
    every hash below θ is a uniform sample of the union, so counts below
    θ scaled by S/θ estimate the true cardinalities. Deterministic sha256
    arithmetic end to end — fully oracle-replayable.

    Output: one row (n_a_sample, n_b_sample, est_a, est_b, est_union,
    est_intersection).
    """
    keyc = F.col(key) if isinstance(key, str) else key
    lab = F.col(label) if isinstance(label, str) else label
    scale = float(1 << 60)
    sentinel = (1 << 60) + 1
    h = (
        F.conv(F.substring(F.sha2(keyc.cast("string"), 256), 1, 15), 16, 10)
        .cast("long")
        + 1
    )
    hashes = (
        df.filter(lab.isin(label_a, label_b))
        .select(lab.alias("__lab"), h.alias("h"))
        .distinct()
    )
    ranked = _bottom_k(hashes, ["__lab"], k)
    # θ per side: k-th smallest hash, or sentinel when the side has < k
    thetas = (
        ranked.groupBy("__lab")
        .agg(
            F.max(F.when(F.col("rn") == k, F.col("h"))).alias("kth"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            "__lab",
            F.coalesce(F.col("kth"), F.lit(sentinel)).alias("theta"),
        )
    )
    theta = thetas.agg(F.min("theta").alias("theta"))  # 1 row
    below = ranked.crossJoin(F.broadcast(theta)).filter(
        F.col("h") < F.col("theta")
    )
    # pivot the sample: which sides saw each hash below θ
    sides = below.groupBy("h", "theta").agg(
        F.max(F.when(F.col("__lab") == label_a, 1).otherwise(0)).alias("in_a"),
        F.max(F.when(F.col("__lab") == label_b, 1).otherwise(0)).alias("in_b"),
    )
    factor = F.when(
        F.col("theta") > F.lit(1 << 60), F.lit(1.0)
    ).otherwise(F.col("theta").cast("double") / F.lit(scale))
    return sides.groupBy("theta").agg(
        F.sum("in_a").alias("n_a_sample"),
        F.sum("in_b").alias("n_b_sample"),
        F.round((F.sum("in_a") / factor), 4).alias("est_a"),
        F.round((F.sum("in_b") / factor), 4).alias("est_b"),
        F.round((F.count(F.lit(1)) / factor), 4).alias("est_union"),
        F.round((F.sum(F.col("in_a") * F.col("in_b")) / factor), 4).alias(
            "est_intersection"
        ),
    ).drop("theta")
