"""Skew-proof sessionization (r8 — motivated by the Zipf-skew sweep).

The classic lag+cumsum sessionization partitions ONE window by the entity
key, so a hot entity (the skewed-100x harness plants ~30% of all events on
one user) serializes into a single sort task — 4.2x degradation at harness
scale, an unbounded straggler on a real cluster. AQE cannot split window
partitions (only join shuffles), and salting would break session
continuity.

The scale-correct plan is the same two-level decomposition the
distributed prefix sum uses (operators/ranking.py): make the heavy pass
per (entity, TIME BUCKET) — the hot entity spreads over its buckets — and
stitch across buckets with per-entity state that is O(buckets), not
O(events):

  phase 1  window over (user, bucket): local new-session flags + local
           session index (lag + cumsum, bucket-bounded partitions);
  phase 2  per (user, bucket) boundary relation (first_ts, last_ts,
           n_sessions — one row per present bucket): a tiny per-user
           window orders buckets, decides whether each bucket's FIRST
           local session continues the previous present bucket's LAST
           session (same inactivity-gap test — correct even across empty
           buckets, because lag skips to the previous PRESENT bucket),
           and prefix-sums global offsets;
  phase 3  equi-join events back on (user, bucket) — a key the hot
           entity no longer dominates — and index globally:
             global_idx = prev_buckets_sessions − merges_so_far + local_idx
           (telescoping, so merge CHAINS — a session spanning many
           buckets — collapse correctly).

Result is bit-identical to the single-window operator (same numbering:
sessions are counted in start order), so it shares the same SQL oracle.
Reference analog: the per-device-type fan-out that concentrates one
worklist (/root/reference/ideafast_etl/hooks/db.py:140-231).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    gap: str = "INTERVAL 30 MINUTES",
    user_col: str = "user_id",
    ts_col: str = "ts",
    tie_col: str = "event_id",
    bucket: str | None = None,
) -> DataFrame:
    """(user, session_idx, n_events, session_start, session_end) per
    session, inactivity gap ``gap``. ``bucket=None`` is the classic
    single-window plan; ``bucket`` (e.g. ``"1 day"``) switches to the
    skew-proof two-phase plan above — identical output."""
    if bucket is None:
        w = Window.partitionBy(user_col).orderBy(ts_col, tie_col)
        flagged = events.withColumn(
            "__new",
            F.when(
                F.lag(ts_col).over(w).isNull()
                | ((F.col(ts_col) - F.lag(ts_col).over(w)) > F.expr(gap)),
                1,
            ).otherwise(0),
        )
        sess = flagged.withColumn(
            "session_idx",
            F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        return sess.groupBy(user_col, "session_idx").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
        )

    bkt = F.window(F.col(ts_col), bucket)["start"].alias("__bkt")
    ev = events.select(user_col, ts_col, tie_col, bkt)

    # phase 1: bucket-local sessionization — partitions bounded by bucket
    wl = Window.partitionBy(user_col, "__bkt").orderBy(ts_col, tie_col)
    local = ev.withColumn(
        "__new",
        F.when(
            F.lag(ts_col).over(wl).isNull()
            | ((F.col(ts_col) - F.lag(ts_col).over(wl)) > F.expr(gap)),
            1,
        ).otherwise(0),
    ).withColumn(
        "__lidx",
        F.sum("__new").over(wl.rowsBetween(Window.unboundedPreceding, 0)),
    )

    # phase 2: per-bucket boundary state, stitched per user (O(buckets))
    bounds = local.groupBy(user_col, "__bkt").agg(
        F.min(ts_col).alias("__first_ts"),
        F.max(ts_col).alias("__last_ts"),
        F.max("__lidx").alias("__nsess"),
    )
    wu = Window.partitionBy(user_col).orderBy("__bkt")
    run = Window.partitionBy(user_col).orderBy("__bkt").rowsBetween(
        Window.unboundedPreceding, 0
    )
    stitched = (
        bounds.withColumn("__prev_last", F.lag("__last_ts").over(wu))
        .withColumn(
            "__merge",
            F.when(
                F.col("__prev_last").isNotNull()
                & (
                    (F.col("__first_ts") - F.col("__prev_last"))
                    <= F.expr(gap)
                ),
                1,
            ).otherwise(0),
        )
        .withColumn(
            "__offset",
            F.coalesce(F.sum("__nsess").over(run) - F.col("__nsess"), F.lit(0))
            - F.sum("__merge").over(run),
        )
        .select(user_col, "__bkt", "__offset")
    )

    # phase 3: global numbering via an equi-join the hot key can't dominate
    glob = local.join(stitched, [user_col, "__bkt"]).withColumn(
        "session_idx", F.col("__offset") + F.col("__lidx")
    )
    return glob.groupBy(user_col, "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
    )
