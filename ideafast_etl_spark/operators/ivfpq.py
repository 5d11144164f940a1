"""IVF-PQ: inverted-file ANN with product-quantized RESIDUALS — the
composite index structure (Jégou et al. 2011 §IV; the FAISS `IVFx,PQy`
workhorse) assembled from this repo's deterministic primitives:

  1. **Coarse quantizer**: the fixed-point spherical k-means
     (:func:`operators.clustering.kmeans_fit`) partitions the corpus
     into cells; at scale the corpus is *stored* partitioned by cell.
  2. **Residual encoding**: each vector's integer residual against its
     cell centroid (exact long subtraction — no float) is product-
     quantized with the shared codebook trainer
     (:func:`operators.pq.train_from_pts`), m codes per vector.
  3. **Query**: rank cells by exact integer inner product, probe the
     top ``n_probe``; score candidates as ``q·c_cell + Σ ADC[sub][code]``
     — the inner-product ADC decomposition q·(c + r̂) = q·c + q·r̂,
     every term an exact integer, divided once at the end.

Everything cross-row is fixed-point, so the whole composite — coarse
clustering, residual codebooks, probing, ADC scores — is bit-identical
under any partitioning AND fully replayable by the SQL oracle
(unrolled CTEs; REPRO.md pattern 8). Recall < 1 vs ``brute_force_topk``
by construction (that is the point: touch n_probe/n_cells of the data).

At 100 TB: training touches the corpus coarse_iters + pq_iters times
(keyed aggs + small broadcasts only); a query touches the probed cells'
code rows — with the corpus bucketed by cell id, that is a partition-
pruned scan plus integer adds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .clustering import _pos_exploded, kmeans_fit
from .pq import _assign, train_from_pts

_SCALE = 1_000_000
_S2 = _SCALE * _SCALE


def ivfpq_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 8,
    coarse_iters: int = 4,
    m: int = 4,
    k_codes: int = 16,
    pq_iters: int = 3,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ approximate top-k; returns (query_id, neighbor_id,
    approx_sim, rank)."""
    dim = df.select(F.size(vec_col)).first()[0]
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    subdim = dim // m

    assign, coarse = kmeans_fit(
        df, vec_col, id_col, k=n_cells, iters=coarse_iters
    )
    cells = assign.select(
        F.col(id_col).alias("__id"), F.col("cluster_id").alias("cell")
    )
    pts = _pos_exploded(df, id_col, vec_col)
    # integer residual against the assigned cell centroid
    rpts = (
        pts.join(cells, "__id")
        .join(
            F.broadcast(coarse.select(F.col("cid").alias("cell"), "pos", "icval")),
            ["cell", "pos"],
        )
        .select(
            "__id",
            (F.col("pos") / subdim).cast("int").alias("sub"),
            (F.col("pos") % subdim).alias("spos"),
            (F.col("ival") - F.col("icval")).alias("ival"),
        )
    )
    seed_ids = (
        df.select(F.col(id_col).alias("__id"))
        .orderBy("__id")
        .limit(k_codes)
        .withColumn(
            "cid", F.row_number().over(Window.orderBy("__id")) - F.lit(1)
        )
    )
    cb = train_from_pts(rpts, seed_ids, pq_iters)
    codes = _assign(rpts, cb)  # (__id, sub, cid)

    q_pts = _pos_exploded(
        queries.select(F.col(id_col).alias("qid"), vec_col), "qid", vec_col
    ).withColumnRenamed("__id", "qid")
    # probe: exact integer q·centroid per cell, keep the n_probe best
    qcell = (
        q_pts.join(
            F.broadcast(coarse.select(F.col("cid").alias("cell"), "pos", "icval")),
            "pos",
        )
        .groupBy("qid", "cell")
        .agg(F.sum(F.col("ival") * F.col("icval")).alias("qc"))
    )
    wp = Window.partitionBy("qid").orderBy(F.desc("qc"), F.asc("cell"))
    probed = (
        qcell.withColumn("rn", F.row_number().over(wp))
        .filter(F.col("rn") <= n_probe)
        .select("qid", "cell", "qc")
    )
    # ADC table: q (raw, not residual) dotted with every residual codeword
    q_sub = q_pts.select(
        "qid",
        (F.col("pos") / subdim).cast("int").alias("sub"),
        (F.col("pos") % subdim).alias("spos"),
        "ival",
    )
    tab = (
        q_sub.join(F.broadcast(cb), ["sub", "spos"])
        .groupBy("qid", "sub", "cid")
        .agg(F.sum(F.col("ival") * F.col("icval")).alias("ip"))
    )
    cands = probed.join(cells, "cell").filter(F.col("__id") != F.col("qid"))
    adc = (
        cands.select("qid", "qc", "__id")
        .join(codes, "__id")
        .join(F.broadcast(tab), ["qid", "sub", "cid"])
        .groupBy("qid", "__id", "qc")
        .agg(F.sum("ip").alias("adc"))
    )
    scored = adc.select(
        F.col("qid").alias("query_id"),
        F.col("__id").alias("neighbor_id"),
        F.round((F.col("qc") + F.col("adc")).cast("double") / _S2, 6).alias(
            "approx_sim"
        ),
    )
    from .similarity import ranked_topk

    return ranked_topk(
        scored,
        ["query_id"],
        [F.desc("approx_sim"), F.asc("neighbor_id")],
        k,
    ).select("query_id", "neighbor_id", "approx_sim", "rank")
