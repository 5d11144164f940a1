"""Memory-pressure / spill validation (r7 verdict directive 2): run the
heavy-hitter queries at 10x under a cluster-realistic memory budget and
prove they complete by SPILLING, not by having been handed a 48 GiB heap.

Why: the scale sweeps run in one big-heap JVM, so a plan that only works
because everything fits in memory (an over-eager broadcast, a hash agg
that never falls back) looks fine there and OOMs on a real executor. Real
clusters give an executor ~4-8 GiB for 4-8 cores (~1 GiB/core);
this harness runs local[SPARK_GRAFT_CPUS=8] with
SPARK_GRAFT_DRIVER_MEM=4g → 0.5 GiB/core, HARSHER than production, with
cluster-shaped shuffle partitioning (64). A query that finishes here
under-provisioned will finish on any sanely-sized cluster.

Usage:
    SPARK_GRAFT_CPUS=8 SPARK_GRAFT_DRIVER_MEM=4g \
        python tools/spill_check.py [sf_dir] [query,query,...]

(defaults: /tmp/sfx10, HEAVY_HITTERS). Per query prints wall time, rows,
and the memory/disk bytes spilled during its stages (from the UI REST API
— the tool enables the UI for itself). Exit code 1 if any query fails.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "4g")

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from ideafast_etl_spark.session import get_spark  # noqa: E402
from scale_check import SCALE_VARIANTS  # noqa: E402

# the queries that dominate the 10x/100x sweeps (SCALE.md ratio tables)
HEAVY_HITTERS = [
    "corpus_prep_e2e",
    "substring_dup_spans",
    "minhash_near_dup",
    "semantic_dedup_auto",
    "supplier_reachability",
    "timeseries_gapfill",
    "cusum_drift",
    "analyze_table_stats_hll",
    "fuzzy_name_pairs",
    "shipment_concurrency_by_month",
]


def _stage_spill(ui: str, app_id: str) -> tuple[int, int]:
    """(memoryBytesSpilled, diskBytesSpilled) summed over completed stages."""
    url = f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
    with urllib.request.urlopen(url, timeout=10) as r:
        stages = json.load(r)
    return (
        sum(s.get("memoryBytesSpilled", 0) for s in stages),
        sum(s.get("diskBytesSpilled", 0) for s in stages),
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfx10"
    names = sys.argv[2].split(",") if len(sys.argv) > 2 else HEAVY_HITTERS
    spark = get_spark(
        "spill-check",
        shuffle_partitions=64,
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4055"},
    )
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    heap = os.environ["SPARK_GRAFT_DRIVER_MEM"]
    cpus = os.environ["SPARK_GRAFT_CPUS"]
    print(f"# heap={heap} cores={cpus} shuffle=64 sf_dir={sf_dir}", flush=True)
    qs = entrymod.queries()
    qs.update(SCALE_VARIANTS)
    failures = 0
    for name in names:
        m0, d0 = _stage_spill(ui, app_id)
        t = time.time()
        try:
            n = qs[name](spark, sf_dir).agg(
                F.count(F.lit(1)).alias("n")
            ).collect()[0]["n"]
        except Exception as e:
            failures += 1
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)
            continue
        dt = time.time() - t
        m1, d1 = _stage_spill(ui, app_id)
        print(
            f"{name}: {dt:.2f}s ({n} rows) spill mem={(m1 - m0) / 2**20:.0f}MiB"
            f" disk={(d1 - d0) / 2**20:.0f}MiB",
            flush=True,
        )
    print(f"{failures} failures")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
