"""Per-task straggler probe: run queries and report the LARGEST task each
one scheduled (runtime / shuffle-read bytes / peak execution memory), via
Spark's status REST API. This is the direct measurement behind the
skew-proof bucketed twins (sessions.py, joins.py `bucket_days`,
timeseries.py `bucket=`): wall clock on a 32-core harness hides a
straggler that a 1000-executor cluster cannot — the single hot-device
sort task IS the job's critical path there, so what we must compare
across plan variants is the maximum per-task work, not the total.

Usage:
    python tools/task_skew_probe.py [sf_dir] [query,query,...]

Each query runs once warm (plan compiled, page cache primed) and once
probed under a dedicated job group; the probe then walks every stage of
every job in the group and takes the max over tasks. Variants registered
only in tools/scale_check.py (``*_bucketed`` e2e twins) are resolved too.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from ideafast_etl_spark.session import get_spark  # noqa: E402


def _get(url: str):
    with urllib.request.urlopen(url, timeout=30) as r:
        return json.loads(r.read().decode())


def probe(spark, qs, names, sf_dir):
    sc = spark.sparkContext
    base = f"{sc.uiWebUrl}/api/v1/applications/{sc.applicationId}"
    for name in names:
        df = qs[name](spark, sf_dir).agg(F.count(F.lit(1)).alias("n"))
        df.collect()  # warm
        group = f"probe-{name}"
        sc.setJobGroup(group, name)
        t0 = time.time()
        n = qs[name](spark, sf_dir).agg(
            F.count(F.lit(1)).alias("n")
        ).collect()[0]["n"]
        wall = time.time() - t0
        sc._jsc.clearJobGroup()
        stage_ids = set()
        for jid in sc.statusTracker().getJobIdsForGroup(group):
            info = sc.statusTracker().getJobInfo(jid)
            if info:
                stage_ids.update(info.stageIds)
        max_run_ms = max_shuffle = max_peak = 0
        n_tasks = 0
        for sid in sorted(stage_ids):
            try:
                s = _get(f"{base}/stages/{sid}/0/taskSummary?quantiles=1.0")
            except Exception:
                continue  # skipped stage (reused exchange) has no attempt
            max_run_ms = max(max_run_ms, s["executorRunTime"][0])
            max_shuffle = max(
                max_shuffle, s["shuffleReadMetrics"]["readBytes"][0]
            )
            max_peak = max(max_peak, s["peakExecutionMemory"][0])
            st = _get(f"{base}/stages/{sid}/0")
            n_tasks += st.get("numCompleteTasks", 0)
        print(
            f"{name}: wall {wall:.2f}s over {n_tasks} tasks ({n} rows) | "
            f"MAX task: run {max_run_ms / 1e3:.2f}s, "
            f"shuffle-read {max_shuffle / 2**20:.1f} MiB, "
            f"peak-exec-mem {max_peak / 2**20:.1f} MiB",
            flush=True,
        )


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from scale_check import SCALE_VARIANTS  # noqa: PLC0415

    qs = entrymod.queries()
    qs.update(SCALE_VARIANTS)
    names = (
        sys.argv[2].split(",")
        if len(sys.argv) > 2
        else ["interval_containment_join"]
    )
    # the status REST API lives on the UI server, which the shared session
    # factory disables for throughput — the probe is the one tool that
    # needs it on
    spark = get_spark(
        "task-skew-probe",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4050"},
    )
    probe(spark, qs, names, sf_dir)


if __name__ == "__main__":
    main()
