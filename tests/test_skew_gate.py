"""Task-skew gate (r9 verdict #4): the bucketed twins' DECOMPOSITION
invariants as a pytest gate, on a planted-skew dataset.

``tools/task_skew_probe.py`` measures max per-task work by hand; what
predicts cluster behavior (SCALE.md) is structural and checkable in CI:

1. the bucketed variant's plan really partitions its heavy windows by
   (entity, bucket) — the bucket key is present in the physical plan,
   and absent from the single-window variant's;
2. the largest (entity, bucket) group is a small fraction of the
   largest (entity) group on skewed data — a window task's work IS its
   partition, so this bounds the straggler the probe measures;
3. the decomposed plan is row-identical to the single-window plan on
   data where the cross-bucket stitch MATTERS (a giant assignment
   dominating later buckets; sessions spanning bucket boundaries).

A regression that silently delegates the bucketed path to the single
window keeps wall clock and parity fine at test scale — (1)+(2) catch
it. Removing the carry/stitch keeps the plan shape — (3) catches it.
"""

import datetime as dt

from pyspark.sql import functions as F

from ideafast_etl_spark.operators.joins import interval_containment_join
from ideafast_etl_spark.operators.sessions import sessionize
from ideafast_etl_spark.plan_audit import no_checkpoints

D0 = dt.date(2024, 1, 1)


def _interval_data(spark):
    """One hot device (75% of rows) + cold devices; the hot device's
    FIRST assignment spans the whole year, so every later hot
    assignment is dominated ACROSS bucket boundaries — pruning them
    requires the per-device carry, not just the bucket-local window."""
    asg, rec = [], []
    # giant early assignment: starts day 0, covers days 0..400
    asg.append(("hot", D0, D0 + dt.timedelta(days=400), 1))
    aid = 2
    for d in range(0, 360, 1):  # 360 dominated later assignments
        asg.append(
            ("hot", D0 + dt.timedelta(days=d + 1),
             D0 + dt.timedelta(days=d + 3), aid)
        )
        aid += 1
    for c in range(10):
        for d in range(0, 360, 30):
            asg.append(
                (f"cold{c}", D0 + dt.timedelta(days=d),
                 D0 + dt.timedelta(days=d + 29), aid)
            )
            aid += 1
    rid = 1
    for d in range(0, 360, 1):
        rec.append((rid, "hot", D0 + dt.timedelta(days=d + 1),
                    D0 + dt.timedelta(days=d + 1)))
        rid += 1
    for c in range(10):
        for d in range(0, 360, 30):
            rec.append((rid, f"cold{c}", D0 + dt.timedelta(days=d + 5),
                        D0 + dt.timedelta(days=d + 6)))
            rid += 1
    assignments = spark.createDataFrame(
        asg, "device_id string, start_wear date, end_wear date, assignment_id long"
    )
    records = spark.createDataFrame(
        rec, "rec_id long, device_id string, start date, end date"
    )
    return records, assignments


def _ij(records, assignments, **kw):
    return interval_containment_join(
        records,
        assignments,
        record_key="rec_id",
        device_col="device_id",
        payload_cols=("assignment_id",),
        order_cols=("start_wear", "assignment_id"),
        **kw,
    )


def _rows(df):
    return sorted(map(tuple, df.collect()))


def _plan(df) -> str:
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_interval_join_bucketed_decomposition_holds(spark):
    records, assignments = _interval_data(spark)
    bucket_days = 30

    # (3) parity where the carry matters: the dominated hot assignments
    # span bucket boundaries, and the reference strategy="join" result
    # is computed without the prune/merge machinery at all
    want = _rows(_ij(records, assignments, strategy="join"))
    assert _rows(_ij(records, assignments, strategy="merge_scan")) == want
    got_bucketed = _rows(
        _ij(records, assignments, strategy="merge_scan",
            bucket_days=bucket_days)
    )
    assert got_bucketed == want

    # (1) the bucket key is IN the bucketed physical plan and NOT in the
    # single-window one — a silent delegation to the single window would
    # pass parity and wall clock but fail here
    with no_checkpoints():
        plan_single = _plan(_ij(records, assignments, strategy="merge_scan"))
        plan_bucketed = _plan(
            _ij(records, assignments, strategy="merge_scan",
                bucket_days=bucket_days)
        )
    assert "__sb" in plan_bucketed
    assert "__sb" not in plan_single

    # (2) the window-partition bound: a window task's work is its
    # partition, and bucketing must shrink the hot device's largest
    # partition by at least ~the planted skew factor
    day = F.datediff(F.col("start_wear"), F.lit(str(D0)).cast("date"))
    per_device = (
        assignments.groupBy("device_id").count().agg(F.max("count")).first()[0]
    )
    per_bucket = (
        assignments.groupBy(
            "device_id", F.floor(day / bucket_days).alias("b")
        )
        .count()
        .agg(F.max("count"))
        .first()[0]
    )
    assert per_bucket * 4 <= per_device


def test_sessionization_bucketed_decomposition_holds(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # hot user: 1500 events over 50 days, sessions crossing midnight
    # (23:50 + 00:10 next day within the 30-min gap) so the stitch matters
    for d in range(50):
        for m in (0, 10, 20, 1430, 1438):  # 23:50 and 23:58
            rows.append((eid, 7, t0 + dt.timedelta(days=d, minutes=m)))
            eid += 1
        rows.append((eid, 7, t0 + dt.timedelta(days=d + 1, minutes=8)))
        eid += 1
    for u in range(20):  # cold users
        for d in range(0, 50, 10):
            rows.append((eid, 100 + u, t0 + dt.timedelta(days=d, hours=u % 12)))
            eid += 1
    ev = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")

    want = _rows(sessionize(ev))
    got = _rows(sessionize(ev, bucket="1 day"))
    assert got == want  # cross-midnight sessions require the stitch

    with no_checkpoints():
        plan_single = _plan(sessionize(ev))
        plan_bucketed = _plan(sessionize(ev, bucket="1 day"))
    assert "__bkt" in plan_bucketed
    assert "__bkt" not in plan_single

    per_user = ev.groupBy("user_id").count().agg(F.max("count")).first()[0]
    per_bucket = (
        ev.groupBy("user_id", F.date_trunc("day", "ts"))
        .count()
        .agg(F.max("count"))
        .first()[0]
    )
    assert per_bucket * 4 <= per_user
