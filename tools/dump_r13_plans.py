"""Dump .explain("formatted") for the queries the r13 optimization round
touched, one file per query, for the judge's plan-claim audit.

Usage: python tools/dump_r13_plans.py <repo_root> <suffix> <out_dir> [query ...]

With explicit query names, dumps only those (for incremental additions to
plans/r13/ without re-dumping the whole set).

Runs inside plan_audit.no_checkpoints() (same discipline as
tools/explain_plans.py / dump_r12_plans.py) so iterative operators explain
their full lazy lineage instead of a vacuous Scan ExistingRDD.
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
    # ivfpq.py: hot-split member relation persisted across the split's
    # six passes (audit-gated, so these prove the audited plan is stable)
    "embedding_topk_ivfpq",
    "embedding_topk_ivfpq_hotsplit",
    # classifier.py: feats persisted across train+score, count fused into
    # the first gradient job (iterative: dumps truncate at the final
    # checkpoint frame; job structure is the change, not plan shape)
    "quality_classifier_scores",
    # ranking offsets audit (VERDICT r12 #6): prove the offsets child is
    # the bounded/aggregated relation in both
    "ccnet_perplexity_buckets",
    "shipment_concurrency_by_month",
]

os.makedirs(out_dir, exist_ok=True)
spark = get_spark("r13-plan-dump")
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
