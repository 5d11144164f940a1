"""Deterministic distributed clustering + semantic dedup (§2.13 extension).

Spherical k-means expressed entirely in DataFrame operations — no MLlib,
no driver-side vector math — built so repeated runs produce IDENTICAL
results regardless of partitioning:

- **Init** is data-derived and order-free: the k lowest-id vectors
  (unit-normalized) seed the centroids.
- **Assignment** is a broadcast join of the pos-exploded vectors against
  the (tiny) pos-exploded centroid relation, summed per (id, cluster) —
  one shuffle keyed by the uniform id.
- **Every cross-row sum is FIXED-POINT**: components quantised to
  ``round(v·10^6)`` longs before aggregation, dot products summed as
  scaled integer products. Integer sums are exactly associative and
  commutative, so assignments, centroid means, and similarities are
  bit-identical under any partitioning or AQE re-plan — the usual
  float-sum nondeterminism of distributed k-means is engineered out
  (cost: 1e-6 component quantisation, irrelevant to clustering).
  Updated centroids are truncated via ``localCheckpoint`` (k·dim rows)
  so the iterative plan never grows beyond one iteration's depth.

Semantic dedup (the SemDeDup recipe, Abbas et al. 2023, arXiv:2303.09540):
cluster the corpus, then search near-duplicate pairs only WITHIN each
cluster — the cluster id becomes the blocking key, turning an O(n²)
all-pairs cosine search into per-cluster equi-join candidates, and each
near-dup group keeps its lowest-id member.

At 100 TB: every stage is an equi-join or keyed aggregation; the only
broadcast relation is the k·dim centroid table; nothing is collected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SCALE = 1_000_000  # fixed-point scale for exact centroid sums


def _pos_exploded(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(id, pos, val) rows with val unit-normalized double components."""
    norm = F.sqrt(
        F.aggregate(
            F.transform(F.col(vec_col), lambda x: x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x * x,
        )
    )
    unit = F.transform(
        F.col(vec_col), lambda x: x.cast("double") / F.col("__norm")
    )
    return (
        df.withColumn("__norm", norm)
        .filter(F.col("__norm") > 0)
        .select(
            F.col(id_col).alias("__id"),
            F.posexplode(unit).alias("pos", "val"),
        )
        .withColumn("ival", F.round(F.col("val") * _SCALE).cast("long"))
    )


def kmeans_assign(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    iters: int = 5,
) -> DataFrame:
    """Deterministic spherical k-means. Returns (id_col, cluster_id, sim):
    every input vector with nonzero norm, its 0-based cluster, and its
    cosine to the final centroid."""
    pts = _pos_exploded(df, id_col, vec_col)
    # deterministic seed: the k lowest ids become clusters 0..k-1
    seed_ids = (
        df.select(F.col(id_col).alias("__id"))
        .orderBy("__id")
        .limit(k)
        .withColumn(
            "cid", F.row_number().over(Window.orderBy("__id")) - F.lit(1)
        )
    )
    cent = (
        pts.join(F.broadcast(seed_ids), "__id")
        .select("cid", "pos", F.col("ival").alias("icval"))
        .localCheckpoint(eager=True)
    )
    for _ in range(iters):
        # assignment: cosine = dot(unit point, unit centroid)
        sims = (
            pts.join(F.broadcast(cent), "pos")
            .groupBy("__id", "cid")
            .agg(
                (
                    F.sum(F.col("ival") * F.col("icval")).cast("double")
                    / (_SCALE * _SCALE)
                ).alias("sim")
            )
        )
        best = sims.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("__id").orderBy(
                    F.col("sim").desc(), F.col("cid")
                )
            ),
        ).filter(F.col("rn") == 1).select("__id", "cid", "sim")
        # update: exact fixed-point mean per (cid, pos), then re-normalize
        sums = (
            pts.join(best.select("__id", "cid"), "__id")
            .groupBy("cid", "pos")
            .agg(
                F.sum(F.col("ival")).alias("s"),
                F.count(F.lit(1)).alias("n"),
            )
            .withColumn("mean", F.col("s").cast("double") / (F.col("n") * _SCALE))
            .withColumn("imean", F.round(F.col("mean") * _SCALE).cast("long"))
        )
        # norm from the quantised components, summed as exact integers
        cnorm = F.sqrt(
            F.sum(F.col("imean") * F.col("imean"))
            .over(Window.partitionBy("cid"))
            .cast("double")
        ) / _SCALE
        cent = (
            sums.select(
                "cid",
                "pos",
                F.round((F.col("imean") / (cnorm * _SCALE)) * _SCALE)
                .cast("long")
                .alias("icval"),
            )
            .localCheckpoint(eager=True)  # k·dim rows: truncate lineage
        )
    sims = (
        pts.join(F.broadcast(cent), "pos")
        .groupBy("__id", "cid")
        .agg(
            (
                F.sum(F.col("ival") * F.col("icval")).cast("double")
                / (_SCALE * _SCALE)
            ).alias("sim")
        )
    )
    return (
        sims.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("__id").orderBy(
                    F.col("sim").desc(), F.col("cid")
                )
            ),
        )
        .filter(F.col("rn") == 1)
        .select(
            F.col("__id").alias(id_col),
            F.col("cid").alias("cluster_id"),
            F.round(F.col("sim"), 6).alias("sim"),
        )
    )


def semantic_dedup(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    iters: int = 5,
    threshold: float = 0.95,
) -> DataFrame:
    """SemDeDup: cluster, then near-dup search within clusters only.
    Returns (id_col, cluster_id, keep) — ``keep`` is false for every
    vector whose cosine to a LOWER-id member of the same cluster is
    ≥ threshold (each near-dup group keeps its lowest id).

    The cluster id is the blocking key: the pairwise stage is an
    equi-self-join on cluster_id, so its cost tracks the largest cluster,
    not n² — the standard SemDeDup scale argument."""
    assign = kmeans_assign(df, vec_col, id_col, k, iters)
    pts = _pos_exploded(df, id_col, vec_col)
    labeled = pts.join(
        assign.select(F.col(id_col).alias("__id"), "cluster_id"), "__id"
    )
    left = labeled.select(
        "cluster_id", F.col("__id").alias("id_a"), "pos",
        F.col("ival").alias("ival_a"),
    )
    right = labeled.select(
        "cluster_id", F.col("__id").alias("id_b"), "pos",
        F.col("ival").alias("ival_b"),
    )
    pair_sims = (
        left.join(right, ["cluster_id", "pos"])
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("cluster_id", "id_a", "id_b")
        .agg(
            (
                F.sum(F.col("ival_a") * F.col("ival_b")).cast("double")
                / (_SCALE * _SCALE)
            ).alias("sim")
        )
    )
    dup_ids = (
        pair_sims.filter(F.col("sim") >= threshold)
        .select(F.col("id_b").alias("__dup"))
        .distinct()
    )
    return assign.join(
        dup_ids, assign[id_col] == F.col("__dup"), "left"
    ).select(
        id_col,
        "cluster_id",
        F.col("__dup").isNull().alias("keep"),
    )
