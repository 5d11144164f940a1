"""Phase breakdown of the IVF-PQ hot-split path (r11 verdict #4).

Replays ``operators.ivfpq.ivfpq_topk(max_cell_size="auto")`` phase by
phase on a scale-harness dir, materializing (localCheckpoint) at each
boundary so every phase is timed exactly once with no lineage
recompute bleeding across boundaries. The phases:

  coarse      kmeans_fit of the coarse quantizer (coarse_iters passes)
  hotcheck    the one-agg any-cell-hot short-circuit
  split       _split_hot_cells: level-2 seed + split_iters x (assign,
              re-center) + final assign — the suspected residual: each
              assign joins the hot members' exploded rows against k2
              sub-centroids, O(members * dim * k2) intermediate rows
  residual    residual encoding of the full corpus against fcent
  pq          codebook training (pq_iters passes) + code assignment
  query       probe ranking + ADC + rerank for the 5-query probe set

Usage: python tools/ivfpq_profile.py [sf_dir]   (default /tmp/sfx100dup)
Prints one line per phase plus rows materialized; refuses on a loaded
box like tools/scale_check.py.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from ideafast_etl_spark import tables  # noqa: E402
from ideafast_etl_spark.operators.clustering import (  # noqa: E402
    _pos_exploded,
    kmeans_fit,
)
from ideafast_etl_spark.operators.ivfpq import (  # noqa: E402
    _S2,
    _split_hot_cells,
)
from ideafast_etl_spark.operators.pq import _assign, train_from_pts  # noqa: E402
from ideafast_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    load1, _l5, _ = os.getloadavg()
    ncpu = os.cpu_count() or 1
    if load1 > 0.25 * ncpu and "--force" not in sys.argv:
        print(f"REFUSING: loadavg {load1:.2f} on {ncpu} cpus (--force to override)")
        sys.exit(2)
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--") else "/tmp/sfx100dup"
    spark = get_spark("ivfpq-profile")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    df = tables.load(spark, "embeddings", sf_dir)
    queries = df.filter(F.col("vec_id") < 5)
    k, n_cells, coarse_iters = 5, 8, 4
    m, k_codes, pq_iters, n_probe = 4, 16, 3, 3
    split_iters, max_split, auto_hot_factor = 2, 32, 2.0
    id_col, vec_col = "vec_id", "embedding"

    t = {}

    def phase(name, fn):
        t0 = time.time()
        out = fn()
        t[name] = round(time.time() - t0, 2)
        print(f"# {name}: {t[name]}s", flush=True)
        return out

    dim = df.select(F.size(vec_col)).first()[0]
    subdim = dim // m
    n = df.count()
    max_cell_size = max(1, -(-int(auto_hot_factor * n) // n_cells))
    print(f"# corpus n={n}, auto cap={max_cell_size}")

    def _coarse():
        assign, coarse = kmeans_fit(df, vec_col, id_col, k=n_cells, iters=coarse_iters)
        cells = assign.select(
            F.col(id_col).alias("__id"), F.col("cluster_id").alias("cell")
        ).localCheckpoint(eager=True)
        return cells, coarse.localCheckpoint(eager=True)

    cells, coarse = phase("coarse", _coarse)
    pts = _pos_exploded(df, id_col, vec_col).localCheckpoint(eager=True)

    do_split = phase(
        "hotcheck",
        lambda: (
            cells.groupBy("cell")
            .agg(F.count(F.lit(1)).alias("csz"))
            .filter(F.col("csz") > max_cell_size)
            .limit(1)
            .count()
            > 0
        ),
    )
    print(f"# do_split={do_split}")

    def _split():
        c2, fc = _split_hot_cells(
            pts, cells, coarse, max_cell_size, split_iters, max_split
        )
        # mirror ivfpq_topk's post-split re-spread (r12): without it the
        # split lineage AQE-coalesces to 1 partition and the PQ stage
        # runs single-task
        c2 = c2.repartition(
            spark.sparkContext.defaultParallelism, "__id"
        )
        return (
            c2.localCheckpoint(eager=True),
            fc.localCheckpoint(eager=True),
        )

    if do_split:
        cells2, fcent = phase("split", _split)
    else:
        cells2 = cells.withColumn("sub", F.lit(0).cast("int"))
        fcent = coarse.select(
            F.col("cid").alias("cell"), F.lit(0).cast("int").alias("sub"),
            "pos", "icval",
        )

    def _residual():
        return (
            pts.join(cells2, "__id")
            .join(F.broadcast(fcent), ["cell", "sub", "pos"])
            .select(
                "__id",
                (F.col("pos") / subdim).cast("int").alias("sub"),
                (F.col("pos") % subdim).alias("spos"),
                (F.col("ival") - F.col("icval")).alias("ival"),
            )
            .localCheckpoint(eager=True)
        )

    rpts = phase("residual", _residual)

    def _pq():
        seed_ids = (
            df.select(F.col(id_col).alias("__id"))
            .orderBy("__id")
            .limit(k_codes)
            .withColumn(
                "cid", F.row_number().over(Window.orderBy("__id")) - F.lit(1)
            )
        )
        cb = train_from_pts(rpts, seed_ids, pq_iters)
        return _assign(rpts, cb).localCheckpoint(eager=True), cb

    codes, cb = phase("pq", _pq)

    def _query():
        q_pts = _pos_exploded(
            queries.select(F.col(id_col).alias("qid"), vec_col), "qid", vec_col
        ).withColumnRenamed("__id", "qid")
        qcell = (
            q_pts.join(F.broadcast(fcent), "pos")
            .groupBy("qid", "cell", "sub")
            .agg(F.sum(F.col("ival") * F.col("icval")).alias("qc"))
        )
        wp = Window.partitionBy("qid").orderBy(
            F.desc("qc"), F.asc("cell"), F.asc("sub")
        )
        probed = (
            qcell.withColumn("rn", F.row_number().over(wp))
            .filter(F.col("rn") <= n_probe)
            .select("qid", "cell", "sub", "qc")
        )
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
        cands = probed.join(cells2, ["cell", "sub"]).filter(
            F.col("__id") != F.col("qid")
        )
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
            F.round(
                (F.col("qc") + F.col("adc")).cast("double") / _S2, 6
            ).alias("approx_sim"),
        )
        from ideafast_etl_spark.operators.similarity import ranked_topk

        return (
            ranked_topk(
                scored,
                ["query_id"],
                [F.desc("approx_sim"), F.asc("neighbor_id")],
                k,
            ).count()
        )

    rows = phase("query", _query)
    total = round(sum(t.values()), 2)
    print(f"PROFILE {t} total={total}s rows={rows} sf_dir={sf_dir}")


if __name__ == "__main__":
    main()
