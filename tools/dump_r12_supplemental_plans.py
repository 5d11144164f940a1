"""Supplemental r12 plan dumps for the two queries whose FINAL frame
necessarily truncates at a materialization barrier (pagerank's
per-iteration localCheckpoint, ccnet's global_rank offsets job), so the
judge can check the r12 plan claims where they actually live:

  - pagerank_iteration_{before,after}.txt — ONE Pregel iteration's
    contribs plan (e ⋈ ranks ⋈ outdeg → groupBy dst). The r12 claim:
    the persisted edge relation is hash-partitioned on src, so the
    iteration join no longer exchanges the edge side.
  - ccnet_scored_{before,after}.txt — the scored relation that feeds
    ccnet_perplexity_buckets' rank stage. before = the composed
    train_ngram_lm + score_kn_perplexity form r11 shipped; after = the
    fused ngram_lm_perplexity(materialize=True) form, explained lazily
    under plan_audit.no_checkpoints() (the audit discipline).

Usage: python tools/dump_r12_supplemental_plans.py <repo_root> <suffix>
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

root, suffix = sys.argv[1], sys.argv[2]
sys.path.insert(0, root)

from pyspark.sql import functions as F  # noqa: E402

from ideafast_etl_spark import plan_audit, tables  # noqa: E402
from ideafast_etl_spark.operators.graph import (  # noqa: E402
    PR_SCALE,
    purchase_graph_edges,
)
from ideafast_etl_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"
OUT = "/root/repo/plans/r12"


def dump(df, name):
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    path = os.path.join(OUT, f"{name}_{suffix}.txt")
    with open(path, "w") as fh:
        fh.write(buf.getvalue())
    print(f"wrote {path} ({len(buf.getvalue())} bytes)")


spark = get_spark("r12-supplemental-plans")

# --- pagerank: one iteration, replicated exactly as operators/graph.py
# builds it in this checkout (before: bare persist; after: repartition
# on src before the persist).
edges = purchase_graph_edges(
    tables.load(spark, "orders", SF_DIR), tables.load(spark, "lineitem", SF_DIR)
)
e = edges.select(
    F.col("src").cast("long").alias("src"),
    F.col("dst").cast("long").alias("dst"),
)
if suffix == "after":
    e = e.repartition(spark.sparkContext.defaultParallelism, "src")
e = e.persist()
nodes = (
    e.select(F.col("src").alias("node"))
    .unionByName(e.select(F.col("dst").alias("node")))
    .distinct()
    .persist()
)
outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg")).persist()
ranks = nodes.withColumn("irank", F.lit(PR_SCALE).cast("long"))
contribs = (
    e.join(ranks, e.src == ranks.node)
    .join(outdeg, "src")
    .select("dst", F.expr("irank div outdeg").alias("c"))
    .groupBy("dst")
    .agg(F.sum("c").alias("contrib"))
)
dump(contribs, "pagerank_iteration")

# --- ccnet scored stage (lazy, audit discipline)
docs = tables.load(spark, "documents", SF_DIR)
with plan_audit.no_checkpoints():
    if suffix == "before":
        from ideafast_etl_spark.operators.lm import (
            score_kn_perplexity,
            train_ngram_lm,
        )

        nc, cc, v = train_ngram_lm(docs, n=2)
        scored = score_kn_perplexity(docs, nc, cc, v, n=2)
    else:
        from ideafast_etl_spark.operators.lm import ngram_lm_perplexity

        scored = ngram_lm_perplexity(docs, n=2, smoothing="kn", materialize=True)
    dump(scored, "ccnet_scored")

spark.stop()
