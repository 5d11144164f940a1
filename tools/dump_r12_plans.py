"""Dump .explain("formatted") for the queries the r12 optimization round
touched, one file per query, for the judge's plan-claim audit.

Usage: python tools/dump_r12_plans.py <repo_root> <suffix> <out_dir> [query ...]

With explicit query names, dumps only those (for incremental additions to
plans/r12/ without re-dumping the whole set).

Runs inside plan_audit.no_checkpoints() (same discipline as
tools/explain_plans.py) so iterative operators explain their full lazy
lineage instead of a vacuous Scan ExistingRDD.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

root, suffix, out_dir = sys.argv[1], sys.argv[2], sys.argv[3]
sys.path.insert(0, root)

import __spark_entry__ as entrymod  # noqa: E402
from ideafast_etl_spark import plan_audit  # noqa: E402
from ideafast_etl_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"

QUERIES = [
    # ivfpq.py: re-spread after hot-split + cached reused relations
    "embedding_topk_ivfpq",
    "embedding_topk_ivfpq_hotsplit",
    # lm.py / queries.py: ccnet switched composed -> fused+materialized
    "ccnet_perplexity_buckets",
    "ngram_lm_perplexity",
    "kneser_ney_perplexity",
    # graph.py: BFS piece-checkpoint shave, PageRank pre-partitioned cache
    "supplier_reachability",
    "supplier_pagerank",
    # dedup.py / similarity.py: sampled auto diagnostics (declared queries
    # pin explicit postures; these prove their plans did NOT change)
    "minhash_near_dup",
    "minhash_near_dup_star",
    "embedding_near_dup",
    # clustering.py: kmeans_fit pts persist + assignment checkpoint (the
    # caching is audit-gated, so these prove the audited plans did NOT
    # change)
    "embedding_topk_ivf",
    "kmeans_embeddings",
    "semantic_dedup",
]

os.makedirs(out_dir, exist_ok=True)
spark = get_spark("r12-plan-dump")
qs = entrymod.queries()
for name in sys.argv[4:] or QUERIES:
    fn = qs[name]
    with plan_audit.no_checkpoints():
        df = fn(spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
    path = os.path.join(out_dir, f"{name}_{suffix}.txt")
    with open(path, "w") as fh:
        fh.write(buf.getvalue())
    print(f"wrote {path} ({len(buf.getvalue())} bytes)")
spark.stop()
