"""Join operators (SURVEY.md §2.6, J1-J4).

Scale notes (100 TB posture):
  - J1 anti-join: both sides big → shuffle hash/sort-merge on `hash`, which is
    a uniformly distributed sha256 key, so no skew; AQE handles stragglers.
  - J2/J3 lookups: dimension side is tiny → explicit ``broadcast()`` so the
    fact table never shuffles.
  - J4 interval join: equi-key ``device_id`` hash join with a non-equi residual
    filter — Catalyst plans BroadcastHashJoin when the assignments dim is small
    (the realistic case: assignments ≪ recordings). The first-match tie-break
    is a per-record window, partitioned by the record key, so it shuffles only
    the *matched* rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.scalar import normalise_day


def _auto_bucket_days(
    records: DataFrame,
    assignments: DataFrame,
    device_col: str,
    auto_device_rows: int,
    auto_bucket_days: int,
) -> int | None:
    """Data-driven bucket_days selection (r9 verdict #7 — the
    ``mmr_rerank`` ``loop="auto"`` pattern): one bounded diagnostic
    aggregation per side measures the hottest device's row count; above
    ``auto_device_rows`` the single-task-per-device windows are declared
    skewed and the (device, day-bucket) decomposition engages with width
    ``auto_bucket_days``. Under plan-audit mode (checkpoints disabled)
    no job may run: auto resolves to the bucketed, scale-safe plan
    deterministically."""
    from ..plan_audit import checkpoints_enabled

    if not checkpoints_enabled():
        return auto_bucket_days
    hot = 0
    for side in (assignments, records):
        got = (
            side.groupBy(device_col)
            .agg(F.count(F.lit(1)).alias("c"))
            .agg(F.max("c").alias("m"))
            .first()
        )
        hot = max(hot, int(got["m"] or 0))
    return auto_bucket_days if hot > auto_device_rows else None


def dedup_against_state(incoming: DataFrame, state_hashes: DataFrame, key: str = "hash") -> DataFrame:
    """J1 — hash anti-join: keep incoming rows never seen in state
    (dags/dreem.py:48-66 + db.py:228-231, where it's a collected Python set —
    here it stays distributed as a left_anti join)."""
    return incoming.join(state_hashes.select(key), on=key, how="left_anti")


def lookup_join(
    facts: DataFrame,
    dim: DataFrame,
    on: Column,
    select_from_dim: dict[str, str],
    how: str = "left",
) -> DataFrame:
    """J2/J3 — broadcast lookup equi-join; unmatched rows keep NULL and are
    retried next run (dags/dreem.py:75-115, operators/ucam.py:12-68).

    ``select_from_dim`` maps dim column → output alias."""
    dim_small = dim.select(*select_from_dim.keys())
    joined = facts.join(F.broadcast(dim_small), on, how)
    for src, alias in select_from_dim.items():
        if src != alias:
            joined = joined.withColumnRenamed(src, alias)
    return joined


def interval_containment_join(
    records: DataFrame,
    assignments: DataFrame,
    record_key: str = "hash",
    device_col: str = "device_id",
    rec_start: str = "start",
    rec_end: str = "end",
    asg_start: str = "start_wear",
    asg_end: str = "end_wear",
    payload_cols: tuple[str, ...] = ("patient_id",),
    order_cols: tuple[str, ...] | None = None,
    strategy: str = "auto",
    bucket_days: int | str | None = None,
    auto_device_rows: int = 1_000_000,
    auto_bucket_days: int = 30,
) -> DataFrame:
    """J4 — interval-containment join: for each record, find the assignment on
    the same device whose day-normalised wear period contains BOTH the record's
    start and end days; NULL ``end_wear`` means "still wearing" (open interval,
    treated as today). First match wins, made deterministic with an explicit
    ``order_col`` tie-break (the reference relies on API list order —
    ideafast_etl/hooks/ucam.py:119-136, dags/dreem.py:117-151; divergence
    documented in SURVEY.md §7.4).

    ``strategy``:
      - ``"join"``: equi-join on ``device_col`` (hash join; broadcast when
        the assignments side is small) + residual range predicates, then a
        window partitioned by the record key keeping row_number()==1.
        Per-device cost is O(records x surviving assignments).
      - ``"merge_scan"`` (requires ``order_cols`` led by ``asg_start``):
        fully linear. After the dominated-assignment prune, survivor end
        days are STRICTLY INCREASING in tie-break order, so the first
        match for a record is the unique survivor with the smallest end
        day >= the record's end day whose start is <= the record's start
        — an as-of lookup, not a join: union survivors and records per
        device, one window sorted by day descending with a running
        last(survivor) over the preceding frame (O(n) accumulative frame;
        an unbounded-FOLLOWING frame would re-scan per row and be
        quadratic itself), then validate containment. Per-device cost is
        O((records + assignments) log) — the hot-key quadratic is gone.
      - ``"auto"``: ``merge_scan`` when sound (start-led order_cols),
        else ``join``.

    Degenerate-key guard (r8 — found by the Zipf-skew sweep): an equi-join
    key carrying a large share of BOTH sides makes the per-key candidate
    set quadratic (hot device with n records x m assignments probes n*m
    pairs before the residual filter — the skewed-10x harness run hung
    here). Since only the FIRST match (min by ``order_cols``) survives,
    any assignment whose day-span is covered by an earlier-ordered
    assignment of the same device can never win for any record and is
    pruned BEFORE the join: one window per device computing the running
    max of predecessors' end days (sound when ``order_cols[0]`` is the
    interval start, so every predecessor also starts no later — the
    default and the reference's ordering). For equal-length-interval
    fan-out (the planted pathology) this collapses the hot key from
    O(rows) to O(distinct start days).

    ``bucket_days`` (r9 — the last single-task window in the skew
    story): the prune window and the merge scan both partition by
    ``device_col`` alone, so a 30 % hot device still sorts 30 % of the
    union in ONE task. With ``bucket_days`` set (e.g. 30), both
    decompose over (device, day-bucket) with a per-device boundary
    stitch — the `sessions.py` phase-2 shape. The stitch relations are
    tiny: the prune carries max(end) per previous bucket; the scan
    carries the last-seen survivor struct per previous bucket (after
    the prune, survivors are O(distinct start days) per device).
    Identical output; max task size capped at O(device-bucket).
    ``bucket_days="auto"`` measures the hottest device first (one
    bounded diagnostic agg per side — :func:`_auto_bucket_days`) and
    engages the decomposition at width ``auto_bucket_days`` only above
    ``auto_device_rows`` rows on one device; output is identical either
    way, so auto trades one cheap extra job for picking the plan a
    caller would otherwise have to know to request.
    """
    order_cols = order_cols or (asg_start,)
    prunable = order_cols[0] == asg_start
    if bucket_days == "auto":
        bucket_days = _auto_bucket_days(
            records, assignments, device_col, auto_device_rows,
            auto_bucket_days,
        )
    if prunable:
        end_d = F.coalesce(
            normalise_day(F.col(asg_end)), F.current_date().cast("timestamp")
        )
        if bucket_days is None:
            w_prune = (
                Window.partitionBy(device_col)
                .orderBy(*[F.col(c).asc_nulls_last() for c in order_cols])
                .rowsBetween(Window.unboundedPreceding, -1)
            )
            assignments = (
                assignments.withColumn("__end_d", end_d)
                .withColumn("__cov", F.max("__end_d").over(w_prune))
                .filter(
                    F.col("__cov").isNull() | (F.col("__cov") < F.col("__end_d"))
                )
                .drop("__end_d", "__cov")
            )
        else:
            assignments = _bucketed_prune(
                assignments, device_col, asg_start, end_d, order_cols,
                bucket_days,
            )
    if strategy not in ("auto", "join", "merge_scan"):
        raise ValueError(f"unknown strategy {strategy!r}")
    if strategy == "merge_scan" and not prunable:
        raise ValueError("merge_scan requires order_cols led by asg_start")
    if prunable and strategy in ("auto", "merge_scan"):
        return _containment_merge_scan(
            records, assignments, device_col, rec_start, rec_end,
            asg_start, asg_end, payload_cols, bucket_days,
        )
    a = assignments.alias("a")
    r = records.alias("r")

    r_start_d = normalise_day(F.col(f"r.{rec_start}"))
    r_end_d = normalise_day(F.col(f"r.{rec_end}"))
    a_start_d = normalise_day(F.col(f"a.{asg_start}"))
    a_end_d = F.coalesce(
        normalise_day(F.col(f"a.{asg_end}")), F.current_date().cast("timestamp")
    )

    cond = (
        (F.col(f"r.{device_col}") == F.col(f"a.{device_col}"))
        & (a_start_d <= r_start_d)
        & (r_start_d <= a_end_d)
        & (a_start_d <= r_end_d)
        & (r_end_d <= a_end_d)
    )
    joined = r.join(a, cond, "left")
    w = Window.partitionBy(F.col(f"r.{record_key}")).orderBy(
        *[F.col(f"a.{c}").asc_nulls_last() for c in order_cols]
    )
    first = joined.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1)
    out_cols = [F.col(f"r.{c}") for c in records.columns if c not in payload_cols] + [
        F.col(f"a.{c}").alias(c) for c in payload_cols
    ]
    return first.select(*out_cols)


def _bucketed_prune(
    assignments: DataFrame,
    device_col: str,
    asg_start: str,
    end_d: Column,
    order_cols: tuple[str, ...],
    bucket_days: int,
) -> DataFrame:
    """Skew-proof twin of the dominated-assignment prune: the running
    max of predecessors' end days decomposes over (device, start-day
    bucket) — bucket-local running max + a per-device carry of each
    previous bucket's max (one row per present bucket, so the stitch
    window is O(day-span / bucket_days) per device). NULL start days
    sort last in the tie-break order, so they land in a +inf sentinel
    bucket whose carry-in is the max over every real bucket — exactly
    the predecessors they had in the single window."""
    start_day = normalise_day(F.col(asg_start))
    sb = F.coalesce(
        F.floor(
            F.datediff(start_day, F.lit("1970-01-01").cast("date"))
            / bucket_days
        ),
        F.lit(2**62),
    )
    a = assignments.withColumn("__end_d", end_d).withColumn("__sb", sb)
    bmax = a.groupBy(device_col, "__sb").agg(F.max("__end_d").alias("__bmax"))
    w_carry = (
        Window.partitionBy(device_col)
        .orderBy("__sb")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = bmax.withColumn(
        "__pcov", F.max("__bmax").over(w_carry)
    ).drop("__bmax")
    a = a.join(carry, [device_col, "__sb"], "left")
    w_loc = (
        Window.partitionBy(device_col, "__sb")
        .orderBy(*[F.col(c).asc_nulls_last() for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # greatest() skips NULLs: local-only, carry-only, and both-NULL all
    # reduce to the single-window running max of strict predecessors
    cov = F.greatest(F.max("__end_d").over(w_loc), F.col("__pcov"))
    return (
        a.withColumn("__cov", cov)
        .filter(F.col("__cov").isNull() | (F.col("__cov") < F.col("__end_d")))
        .drop("__end_d", "__sb", "__pcov", "__cov")
    )


def _containment_merge_scan(
    records: DataFrame,
    assignments: DataFrame,
    device_col: str,
    rec_start: str,
    rec_end: str,
    asg_start: str,
    asg_end: str,
    payload_cols: tuple[str, ...],
    bucket_days: int | None = None,
) -> DataFrame:
    """Linear first-containment-match (see interval_containment_join's
    ``merge_scan`` strategy). ``assignments`` arrives already pruned, so
    per device its end days strictly increase in tie-break order and the
    first match for a record is the survivor with the smallest end day
    >= the record's end day (validated for start containment).

    ``bucket_days`` decomposes the day-DESC scan over (device,
    day-bucket): the running last(survivor) at a row is either a
    survivor already seen inside its own bucket, or — when none yet —
    the tail survivor (smallest end day; end days are distinct per
    device post-prune) of the nearest HIGHER bucket that has one. The
    carry relation has one row per present (device, bucket), so the
    per-device stitch window is tiny and the hot device's sort spreads
    over its buckets."""
    a_start_d = normalise_day(F.col(asg_start))
    a_end_d = F.coalesce(
        normalise_day(F.col(asg_end)), F.current_date().cast("timestamp")
    )
    # one atomic struct per survivor: first()/last() over a struct keeps
    # start/end/payloads from the SAME survivor even when a payload is NULL
    surv = assignments.filter(a_start_d.isNotNull()).select(
        F.col(device_col),
        a_end_d.alias("__day"),
        F.lit(1).alias("__tag"),
        F.struct(
            a_start_d.alias("__a_start"),
            a_end_d.alias("__a_end"),
            *[F.col(c).alias(c) for c in payload_cols],
        ).alias("__s"),
    )
    # the join predicates demand containment of BOTH record endpoints —
    # i.e. of [least, greatest] — so keying the scan on those (nulled when
    # either endpoint is null, like the join's null semantics) stays exact
    # even for reversed record intervals
    r_s, r_e = normalise_day(F.col(rec_start)), normalise_day(F.col(rec_end))
    both = r_s.isNotNull() & r_e.isNotNull()
    rec = records.select(
        *records.columns,
        F.when(both, F.least(r_s, r_e)).alias("__r_start"),
        F.when(both, F.greatest(r_s, r_e)).alias("__day"),
        F.lit(0).alias("__tag"),
    )
    u = rec.unionByName(surv, allowMissingColumns=True)
    # day DESC scan with an ACCUMULATIVE preceding frame: the running
    # last(non-null survivor) at a record row is the survivor with the
    # smallest end day >= the record's end day. desc_nulls_first parks
    # null-day records before every survivor (they can never match);
    # tag desc makes a same-day survivor visible to its records.
    if bucket_days is None:
        w = (
            Window.partitionBy(device_col)
            .orderBy(F.col("__day").desc_nulls_first(), F.col("__tag").desc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        m = F.last("__s", ignorenulls=True).over(w)
    else:
        # null days sort FIRST in the desc scan → +inf sentinel bucket
        # (only records can land there; survivors' __day is never null)
        bkt = F.coalesce(
            F.floor(
                F.datediff(F.col("__day"), F.lit("1970-01-01").cast("date"))
                / bucket_days
            ),
            F.lit(2**62),
        )
        u = u.withColumn("__bkt", bkt)
        w_loc = (
            Window.partitionBy(device_col, "__bkt")
            .orderBy(F.col("__day").desc_nulls_first(), F.col("__tag").desc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        m_loc = F.last("__s", ignorenulls=True).over(w_loc)
        tails = (
            u.filter(F.col("__tag") == 1)
            .groupBy(device_col, "__bkt")
            .agg(F.min_by("__s", "__day").alias("__tail"))
        )
        bkts = (
            u.select(device_col, "__bkt")
            .distinct()
            .join(tails, [device_col, "__bkt"], "left")
        )
        w_carry = (
            Window.partitionBy(device_col)
            .orderBy(F.col("__bkt").desc())
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        carry = bkts.withColumn(
            "__cin", F.last("__tail", ignorenulls=True).over(w_carry)
        ).select(device_col, "__bkt", "__cin")
        u = u.join(carry, [device_col, "__bkt"], "left")
        m = F.coalesce(m_loc, F.col("__cin"))
    ok = (
        m.isNotNull()
        & (m["__a_start"] <= F.col("__r_start"))
        & (F.col("__day") <= m["__a_end"])
    )
    scanned = u.withColumn("__m", F.when(ok, m))
    return scanned.filter(F.col("__tag") == 0).select(
        *[F.col(c) for c in records.columns if c not in payload_cols],
        *[F.col("__m")[c].alias(c) for c in payload_cols],
    )
