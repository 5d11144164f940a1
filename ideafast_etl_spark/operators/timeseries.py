"""Time-series resampling: gap-fill (LOCF) and linear interpolation.

Hypertable-style operators Spark lacks natively: regularise an irregular
per-key event stream onto a fixed time grid, then fill the holes. The
reference's day-window bucketing (G1, ideafast_etl/utils.py group-by-day
cut-off logic) is the degenerate one-bucket-per-day case of this; these
generalise it to arbitrary steps with forward-fill and interpolation.

Plan shape (all built-in expressions, no UDFs):

  1. bucket observed rows to the grid step and aggregate per (key, bucket)
     — ONE shuffle on a uniform composite key; the value aggregate is a
     fixed-point (×1e6 bigint) sum so the per-bucket mean is
     order-independent and hash-matches the DuckDB oracle;
  2. per-key span (min/max bucket) — a tiny second aggregate over the
     already-bucketed relation (rows ∝ buckets, not events);
  3. grid generation via ``sequence(b0, b1, step)`` + explode — grid rows
     are bounded by span/step per key, never by event volume;
  4. left-join grid←observed on (key, bucket);
  5. LOCF/interpolation via ``last(..., ignorenulls)`` /
     ``first(..., ignorenulls)`` windows over the GRID (bounded by
     span/step), not over raw events — the property that keeps the sort
     cheap at 100 TB.

A key spanning years at a fine step emits span/step grid rows; that is the
operator's contract (same as TimescaleDB ``time_bucket_gapfill``), and the
per-key window cost tracks the grid, not the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

Q = 1_000_000  # fixed-point scale for cross-engine-exact value means


def _half_up(a: str, b: str):
    """Round-half-away-from-zero of a/b (b > 0) in pure integer
    arithmetic: (2|a| + b) div (2b), sign reapplied. The abs/sign guard
    matters because Spark's ``div`` truncates toward zero while DuckDB's
    ``//`` floors — they agree only on non-negative operands, and sensor
    values (hence quantized sums) can be negative."""
    return F.expr(
        f"CASE WHEN ({a}) < 0"
        f" THEN -(((-({a})) * 2 + ({b})) div (({b}) * 2))"
        f" ELSE ((({a}) * 2 + ({b})) div (({b}) * 2)) END"
    )


def resample_gapfill(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    step: str = "1 hour",
    trunc_unit: str = "hour",
) -> DataFrame:
    """Resample ``events`` onto a per-key regular grid of ``step`` buckets
    spanning [min(ts), max(ts)] per key, with three fill columns:

    - ``v_obs``: per-bucket mean of observed values (NULL in gaps);
    - ``v_locf``: last observation carried forward;
    - ``v_interp``: linear interpolation between the surrounding observed
      buckets (observed buckets keep their own value; leading/trailing
      edges fall back to LOCF / next observation).

    Output: (key_col, bucket_ts, n_obs, v_obs, v_locf, v_interp), floats
    rounded to 6 decimals. Every float is derived by a SINGLE double
    division of exact integers (quantized sums, counts, epoch deltas,
    composed in decimal(38,0)) — naive ``prev + (next-prev)*frac`` double
    arithmetic differs by 1 ulp across engines (FMA contraction) and
    flips the 6-decimal rounding; the rational form is the repo's
    fixed-point discipline (REPRO.md) applied to interpolation.
    """
    bucket = F.date_trunc(trunc_unit, F.col(ts_col))
    qv = F.round(F.col(value_col) * Q).cast("long")
    obs = (
        events.select(F.col(key_col), bucket.alias("bucket"), qv.alias("qv"))
        .groupBy(key_col, "bucket")
        .agg(F.sum("qv").alias("sq"), F.count(F.lit(1)).alias("n_obs"))
    )
    span = obs.groupBy(key_col).agg(
        F.min("bucket").alias("b0"), F.max("bucket").alias("b1")
    )
    grid = span.select(
        F.col(key_col),
        F.explode(F.expr(f"sequence(b0, b1, interval {step})")).alias("bucket"),
    )
    j = grid.join(obs, [key_col, "bucket"], "left")
    t = F.col("bucket").cast("long")
    wp = (
        Window.partitionBy(key_col)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wn = (
        Window.partitionBy(key_col)
        .orderBy("bucket")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    # carry the exact integer state (quantized sum, count, epoch) through
    # the fill windows, not the float mean — every output float is then
    # an exact-integer rounding divided by Q. Rounding to 6 decimals with
    # engine round() is NOT cross-engine-safe (exact .5 rationals flip:
    # Spark HALF_UP vs DuckDB's double rounding); with Q = 1e6 the
    # 6-decimal rounding of a/(b*Q) is exactly half-up(a/b)/Q, and
    # half-up(a/b) for positive exact integers is (2a+b) div (2b) —
    # computed with integer div on both engines, no float ties anywhere.
    obs_state = F.when(
        F.col("n_obs").isNotNull(), F.struct(F.col("sq"), F.col("n_obs"), t.alias("t"))
    )
    p = F.last(obs_state, ignorenulls=True).over(wp)
    n = F.first(obs_state, ignorenulls=True).over(wn)
    d38 = "decimal(38,0)"
    flat = j.select(
        F.col(key_col),
        "bucket",
        "sq",
        "n_obs",
        t.alias("t"),
        p["sq"].alias("p_sq"),
        p["n_obs"].alias("p_n"),
        p["t"].alias("p_t"),
        n["sq"].alias("nx_sq"),
        n["n_obs"].alias("nx_n"),
        n["t"].alias("nx_t"),
    ).withColumn(
        # gap interpolation as a rational of exact integers (micro-units):
        #   N/D = [p_sq*nx_n*(nx_t-t) + nx_sq*p_n*(t-p_t)] / [p_n*nx_n*(nx_t-p_t)]
        "__num",
        F.col("p_sq").cast(d38) * F.col("nx_n").cast(d38) * (F.col("nx_t") - t).cast(d38)
        + F.col("nx_sq").cast(d38) * F.col("p_n").cast(d38) * (t - F.col("p_t")).cast(d38),
    ).withColumn(
        "__den",
        F.col("p_n").cast(d38) * F.col("nx_n").cast(d38) * (F.col("nx_t") - F.col("p_t")).cast(d38),
    )
    half_up = _half_up
    q = F.lit(float(Q))
    micro_interp = (
        F.when(F.col("n_obs").isNotNull(), half_up("sq", "n_obs"))
        .when(F.col("p_n").isNotNull() & F.col("nx_n").isNotNull(), half_up("__num", "__den"))
        .when(F.col("p_n").isNotNull(), half_up("p_sq", "p_n"))
        .otherwise(half_up("nx_sq", "nx_n"))
    )
    return flat.select(
        F.col(key_col),
        F.col("bucket").alias("bucket_ts"),
        F.coalesce(F.col("n_obs"), F.lit(0)).alias("n_obs"),
        (half_up("sq", "n_obs").cast("double") / q).alias("v_obs"),
        (half_up("p_sq", "p_n").cast("double") / q).alias("v_locf"),
        (micro_interp.cast("double") / q).alias("v_interp"),
    )


def transition_counts(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tie_col: str = "event_id",
    bucket: str | None = None,
) -> DataFrame:
    """First-order Markov transition matrix over per-key event sequences:
    count (previous type → type) adjacencies ordered by (ts, tie), plus
    each transition's share of its source state's outgoing edges.

    One shuffle on the key for the lag window (per-key sort bounded by
    per-key activity), then a keyed count aggregation; the share is an
    integer-derived double division (deterministic cross-engine). The
    reference's lifecycle rungs (F1-F7 NULL-chains, filters.py) are the
    business version of exactly these state transitions.

    ``bucket`` (e.g. ``"1 day"``) switches to the skew-proof two-phase
    plan (r8): within-bucket lag pairs plus one stitch pair per
    consecutive present (key, bucket) — identical counts, hot entity
    spread over its buckets.
    """
    if bucket is not None:
        ev = events.select(
            key_col, tie_col, ts_col, type_col,
            F.window(F.col(ts_col), bucket)["start"].alias("__bkt"),
        )
        wl = Window.partitionBy(key_col, "__bkt").orderBy(ts_col, tie_col)
        local = (
            ev.withColumn("prev_type", F.lag(type_col).over(wl))
            .filter(F.col("prev_type").isNotNull())
            .select("prev_type", F.col(type_col).alias("next_type"))
        )
        bounds = ev.groupBy(key_col, "__bkt").agg(
            F.min(F.struct(ts_col, tie_col, type_col)).alias("__first"),
            F.max(F.struct(ts_col, tie_col, type_col)).alias("__last"),
        )
        wu = Window.partitionBy(key_col).orderBy("__bkt")
        stitch = (
            bounds.withColumn("__prev_last", F.lag("__last").over(wu))
            .filter(F.col("__prev_last").isNotNull())
            .select(
                F.col(f"__prev_last.{type_col}").alias("prev_type"),
                F.col(f"__first.{type_col}").alias("next_type"),
            )
        )
        pairs = (
            local.unionByName(stitch)
            .groupBy("prev_type", "next_type")
            .agg(F.count(F.lit(1)).alias("n"))
        )
    else:
        w = Window.partitionBy(key_col).orderBy(ts_col, tie_col)
        pairs = (
            events.withColumn("prev_type", F.lag(type_col).over(w))
            .filter(F.col("prev_type").isNotNull())
            .groupBy("prev_type", F.col(type_col).alias("next_type"))
            .agg(F.count(F.lit(1)).alias("n"))
        )
    wsrc = Window.partitionBy("prev_type")
    return pairs.select(
        "prev_type",
        "next_type",
        "n",
        F.round(
            F.col("n").cast("double") / F.sum("n").over(wsrc).cast("double"), 6
        ).alias("share"),
    )


def time_weighted_avg(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    tie_col: str = "event_id",
    bucket: str | None = None,
) -> DataFrame:
    """Time-weighted average per key over the LOCF step function
    (TimescaleDB ``time_weight('LOCF')`` analog): each observation holds
    its value until the next one, so

      twa = Σ v_i · (t_{i+1} − t_i) / (t_last − t_first).

    A plain arithmetic mean over-weights bursts of samples; the TWA is
    the right summary for irregularly-sampled sensors (the reference's
    wearable feeds, drm.py S2 assets, report at device-dependent rates).

    One shuffle on the key; the lead window sorts per-key activity only.
    Numerator and denominator are exact integers (micro-unit values ×
    epoch-MICROsecond deltas — ``unix_micros``/``epoch_us``, so
    sub-second timestamps lose nothing — composed in decimal(38,0)), so
    the single output division is cross-engine deterministic. Keys with
    one observation have no interval and return NULL.

    Output: (key_col, n_obs, span_us, twa).

    ``bucket`` (e.g. ``"1 day"``) switches to the skew-proof two-phase
    plan (r8, the heartbeat_gaps lead-stitch family): each event's hold
    interval is the in-bucket lead delta, plus ONE boundary interval per
    consecutive present (key, bucket) — the previous bucket's last event
    holds until the next bucket's first. The integral is a plain sum of
    those contributions, so the heavy window runs per (key, bucket) and
    the output is bit-identical (shared oracle).
    """
    t = F.unix_micros(F.col(ts_col))
    qv = F.round(F.col(value_col) * Q).cast("long")
    d38 = "decimal(38,0)"
    if bucket is not None:
        ev = events.select(
            F.col(key_col), F.col(tie_col), t.alias("t"), qv.alias("qv"),
            F.window(F.col(ts_col), bucket)["start"].alias("__bkt"),
        )
        wl = Window.partitionBy(key_col, "__bkt").orderBy("t", tie_col)
        local = (
            ev.withColumn("__nt", F.lead("t").over(wl))
            .filter(F.col("__nt").isNotNull())
            .select(key_col, "qv", (F.col("__nt") - F.col("t")).alias("dt"))
        )
        # one row per present (key, bucket): sequence-first/-last events
        bounds = ev.groupBy(key_col, "__bkt").agg(
            F.min(F.struct("t", tie_col, "qv")).alias("__first"),
            F.max(F.struct("t", tie_col, "qv")).alias("__last"),
        )
        wu = Window.partitionBy(key_col).orderBy("__bkt")
        stitch = (
            bounds.withColumn("__prev_last", F.lag("__last").over(wu))
            .filter(F.col("__prev_last").isNotNull())
            .select(
                key_col,
                F.col("__prev_last.qv").alias("qv"),
                (F.col("__first.t") - F.col("__prev_last.t")).alias("dt"),
            )
        )
        contrib = local.unionByName(stitch).groupBy(key_col).agg(
            F.sum(F.col("qv").cast(d38) * F.col("dt").cast(d38)).alias("num"),
            F.sum("dt").alias("span_us"),
        )
        agg = (
            ev.groupBy(key_col)
            .agg(F.count(F.lit(1)).alias("n_obs"))
            .join(contrib, [key_col], "left")
        )
    else:
        w = Window.partitionBy(key_col).orderBy("t", tie_col)
        stepped = events.select(
            F.col(key_col), F.col(tie_col), t.alias("t"), qv.alias("qv")
        ).withColumn("dt", F.lead("t").over(w) - F.col("t"))
        agg = stepped.groupBy(key_col).agg(
            F.count(F.lit(1)).alias("n_obs"),
            F.sum((F.col("qv").cast(d38) * F.col("dt").cast(d38))).alias("num"),
            F.sum("dt").alias("span_us"),
        )
    # num is ~1e22: casting it to double before dividing costs a ulp that
    # differs across engines — round the quotient to micro-units in exact
    # integer arithmetic instead ((2a+b) div 2b half-up, as resample_gapfill)
    micro = _half_up("num", "span_us")
    return agg.select(
        F.col(key_col),
        "n_obs",
        F.coalesce(F.col("span_us"), F.lit(0)).alias("span_us"),
        F.when(F.col("span_us") > 0, micro.cast("double") / F.lit(float(Q))).alias(
            "twa"
        ),
    )


def cusum_drift(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    tie_col: str = "event_id",
    threshold: float = 3.0,
    bucket: str | None = None,
) -> DataFrame:
    """One-sided CUSUM upward-drift detection per key, window-only.

    The textbook recursion S_i = max(0, S_{i-1} + (x_i - mean)) looks
    inherently sequential, but has the closed form

        S_i = P_i - min(0, min_{j<=i} P_j),   P = prefix sum of (x - mean)

    (the 0 floor is load-bearing: when every prefix sum is positive —
    drift at the very start of the series — min_{j<=i} P_j is P_1 > 0
    and omitting the floor would zero out the statistic exactly where
    it should fire)

    so it is TWO stock window aggregates (running sum + running min) —
    no recursion, no UDF, no state store. All arithmetic is exact
    integers: deviations are scaled by the key's count n so the per-key
    mean never becomes a float (d_i = qv_i·n − sx), making P and S exact
    decimal(38,0) values; the reported drift magnitude divides out n·Q
    once at the end. Emits rows where S exceeds ``threshold`` (in value
    units).

    Plan: one keyed moments agg joined back on the key (one row per key —
    at 100 TB that relation is data-sized, so it rides a shuffle join
    co-partitioned with the window shuffle, never a forced broadcast),
    then the two windows over per-key event order. Reference analog: the
    lifecycle rung F-chain flags records one at a time; this flags level
    shifts in the stream itself.

    ``bucket`` (e.g. ``"1 day"``) switches to the skew-proof two-phase
    plan (r8): the RECURSION is nonlinear, but the closed form is two
    running aggregates of the deviation prefix — and both decompose over
    (key, time-bucket) exactly like the distributed prefix sum
    (operators/ranking.py):

      P_i = off_b + p_i                   (off_b = Σ prior buckets' sums)
      min_{j<=i} P_j = min(prior buckets' min(off+p), off_b + local min)

    so the heavy windows run per (key, bucket) — a hot entity spreads
    over its buckets — and the per-key stitch touches one row per
    PRESENT bucket. Exact decimal(38,0) throughout, so the output is
    bit-identical to the single-window plan (shared oracle).
    """
    d38 = "decimal(38,0)"
    qv = F.round(F.col(value_col) * Q).cast("long")
    base = events.select(
        F.col(key_col), F.col(tie_col), F.col(ts_col), qv.alias("qv")
    )
    m = base.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n"), F.sum(F.col("qv").cast(d38)).alias("sx")
    )
    j = base.join(m, key_col)
    dev = F.col("qv").cast(d38) * F.col("n").cast(d38) - F.col("sx")
    if bucket is not None:
        jb = j.withColumn("__bkt", F.window(F.col(ts_col), bucket)["start"])
        wl = Window.partitionBy(key_col, "__bkt").orderBy(ts_col, tie_col)
        lrun = wl.rowsBetween(Window.unboundedPreceding, 0)
        loc = jb.withColumn("__dev", dev).withColumn(
            "__p", F.sum("__dev").over(lrun)
        )
        loc = loc.withColumn("__lm", F.min("__p").over(lrun))
        # one row per present (key, bucket): bucket total + bucket min
        bounds = loc.groupBy(key_col, "__bkt").agg(
            F.sum("__dev").alias("__t"), F.min("__p").alias("__bmin")
        )
        wu = Window.partitionBy(key_col).orderBy("__bkt")
        prevf = wu.rowsBetween(Window.unboundedPreceding, -1)
        off = bounds.withColumn(
            "__off", F.coalesce(F.sum("__t").over(prevf), F.lit(0).cast(d38))
        )
        off = off.withColumn("__om", F.col("__off") + F.col("__bmin"))
        off = off.withColumn("__pmin", F.min("__om").over(prevf))
        stitched = loc.join(
            off.select(key_col, "__bkt", "__off", "__pmin"), [key_col, "__bkt"]
        )
        lm_abs = F.col("__off") + F.col("__lm")
        p_abs = F.col("__off") + F.col("__p")
        run_min = F.least(lm_abs, F.coalesce(F.col("__pmin"), lm_abs))
        s = p_abs - F.least(F.lit(0).cast(d38), run_min)
        scaled = stitched.withColumn("__s", s).withColumn(
            "__den", F.col("n").cast(d38)
        )
    else:
        w = Window.partitionBy(key_col).orderBy(ts_col, tie_col)
        run = w.rowsBetween(Window.unboundedPreceding, 0)
        p = F.sum(dev).over(run)
        # CUSUM closed form, exact integers; the lit(0) floor handles the
        # all-prefix-sums-positive (front-loaded drift) case
        s = p - F.least(F.lit(0).cast(d38), F.min(p).over(run))
        # S/n is the drift in micro-units: half-up it to an exact integer,
        # then one division by Q renders the 6-decimal value
        scaled = j.withColumn("__s", s).withColumn("__den", F.col("n").cast(d38))
    # threshold in exact integers too: S/(n*Q) > h  <=>  S > h_micro*n
    # with h_micro = round(h*Q) — no float comparison ambiguity at all
    h_micro = int(round(threshold * Q))
    out = scaled.filter(
        F.col("__s") > F.lit(h_micro).cast(d38) * F.col("n").cast(d38)
    )
    return out.select(
        F.col(key_col),
        F.col(tie_col),
        F.col(ts_col),
        (_half_up("__s", "__den").cast("double") / F.lit(float(Q))).alias("drift"),
    )


def rolling_zscore(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    tie_col: str = "event_id",
    k: int = 24,
    z_threshold: float = 3.0,
    bucket: str | None = None,
) -> DataFrame:
    """Rolling z-score anomaly per key: each event scored against its own
    trailing-``k``-event window (current row excluded) — the LOCAL
    complement of ``cusum_drift``'s global level-shift detector. Rolling
    moments are exact integer window sums (values quantised to micro
    units); z is one correctly-rounded sqrt + one division. Only full
    windows score. One window pass, no Python, no state store.

    ``bucket`` (e.g. ``"1 day"``) switches to the skew-proof two-phase
    plan (r8): a trailing-k-row sum is a difference of inclusive prefix
    sums, rsum_i = PS_{i-1} − PS_{i-k-1}, and the global per-key row
    index AND both moment prefixes (Σqv, Σqv²) all decompose over
    (key, time-bucket) like the distributed prefix sum — local window
    within the bucket, O(present-buckets) per-key offset stitch, then
    ONE equi-join on (key, idx−k−1) fetches the lagging prefix. All
    moments stay exact decimal(38,0) integers, so the scores are
    bit-identical to the single-window plan (shared oracle); the hot
    entity's heavy sort spreads over its buckets and the join key
    (key, idx) is skew-diluted by construction."""
    d38 = "decimal(38,0)"
    qv = F.round(F.col(value_col) * Q).cast("long")
    base = events.select(tie_col, key_col, ts_col, value_col, qv.alias("qv"))
    q1 = F.col("qv").cast(d38)
    if bucket is not None:
        zero = F.lit(0).cast(d38)
        bb = base.withColumn("__bkt", F.window(F.col(ts_col), bucket)["start"])
        wl = Window.partitionBy(key_col, "__bkt").orderBy(ts_col, tie_col)
        lrun = wl.rowsBetween(Window.unboundedPreceding, 0)
        loc = (
            bb.withColumn("__lidx", F.row_number().over(wl))
            .withColumn("__lps", F.sum(q1).over(lrun))
            .withColumn("__lss", F.sum(q1 * q1).over(lrun))
        )
        # one row per present (key, bucket): counts + moment totals
        bounds = loc.groupBy(key_col, "__bkt").agg(
            F.count(F.lit(1)).alias("__bn"),
            F.sum(q1).alias("__bs"),
            F.sum(q1 * q1).alias("__bss"),
        )
        wu = Window.partitionBy(key_col).orderBy("__bkt")
        prevf = wu.rowsBetween(Window.unboundedPreceding, -1)
        off = (
            bounds.withColumn(
                "__onn", F.coalesce(F.sum("__bn").over(prevf), F.lit(0))
            )
            .withColumn("__ops", F.coalesce(F.sum("__bs").over(prevf), zero))
            .withColumn("__oss", F.coalesce(F.sum("__bss").over(prevf), zero))
        )
        g = loc.join(
            off.select(key_col, "__bkt", "__onn", "__ops", "__oss"),
            [key_col, "__bkt"],
        ).select(
            tie_col,
            key_col,
            ts_col,
            value_col,
            "qv",
            (F.col("__onn") + F.col("__lidx")).alias("__g"),
            (F.col("__ops") + F.col("__lps")).alias("__ps"),
            (F.col("__oss") + F.col("__lss")).alias("__ss"),
        )
        lagged = g.select(
            F.col(key_col).alias("__k2"),
            F.col("__g").alias("__g2"),
            F.col("__ps").alias("__ps2"),
            F.col("__ss").alias("__ss2"),
        )
        probe = g.filter(F.col("__g") >= k + 1).withColumn(
            "__gm", F.col("__g") - F.lit(k + 1)
        )
        jj = probe.join(
            lagged,
            (F.col(key_col) == F.col("__k2")) & (F.col("__gm") == F.col("__g2")),
            "left",
        )
        scored = (
            jj.withColumn("rn", F.lit(k))
            .withColumn(
                "rsum", F.col("__ps") - q1 - F.coalesce(F.col("__ps2"), zero)
            )
            .withColumn(
                "rss", F.col("__ss") - q1 * q1 - F.coalesce(F.col("__ss2"), zero)
            )
        )
    else:
        w = (
            Window.partitionBy(key_col)
            .orderBy(ts_col, tie_col)
            .rowsBetween(-k, -1)
        )
        rn = F.count(F.lit(1)).over(w)
        rsum = F.sum(q1).over(w)
        rss = F.sum(q1 * q1).over(w)
        scored = (
            base.withColumn("rn", rn)
            .withColumn("rsum", rsum)
            .withColumn("rss", rss)
        )
    varn = F.col("rn").cast(d38) * F.col("rss") - F.col("rsum") * F.col("rsum")
    z = (F.col("qv").cast(d38) * F.col("rn").cast(d38) - F.col("rsum")).cast(
        "double"
    ) / F.sqrt(varn.cast("double"))
    return (
        scored.filter(F.col("rn") == k)
        .withColumn("__v", varn)
        .filter(F.col("__v") > 0)
        .withColumn("z_raw", z)
        .filter(F.abs(F.col("z_raw")) >= z_threshold)
        .select(
            tie_col, key_col, ts_col, value_col, F.round("z_raw", 6).alias("z")
        )
    )


def heartbeat_gaps(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    tie_col: str = "event_id",
    min_gap_s: int = 3600,
    bucket: str | None = None,
) -> DataFrame:
    """Silence/heartbeat gap report per key: consecutive-event intervals
    exceeding ``min_gap_s`` seconds, from a single lead window over
    epoch-microsecond integers. The batch form of wearable-feed outage
    detection (the reference polls devices and has no way to see silence
    — /root/reference/dags/dreem.py polls records, not their absence;
    this surfaces silence as data).

    ``bucket`` (e.g. ``"1 day"``) switches to the skew-proof two-phase
    plan (r8, same family as operators/sessions.py): adjacency pairs are
    within-bucket pairs plus one stitch pair per consecutive PRESENT
    (key, bucket) — so the heavy window runs per (key, bucket) and the
    hot entity spreads across its buckets. Output identical."""
    t = F.unix_micros(F.col(ts_col))
    if bucket is None:
        w = Window.partitionBy(key_col).orderBy(ts_col, tie_col)
        g = (
            events.select(key_col, tie_col, ts_col, t.alias("t"))
            .withColumn("next_t", F.lead("t").over(w))
            .withColumn("next_ts", F.lead(ts_col).over(w))
            .filter(F.col("next_t") - F.col("t") > min_gap_s * 1_000_000)
        )
        return g.select(
            key_col,
            F.col(ts_col).alias("gap_start"),
            F.col("next_ts").alias("gap_end"),
            ((F.col("next_t") - F.col("t")) / F.lit(1_000_000.0)).alias("gap_s"),
        )
    ev = events.select(
        key_col, tie_col, ts_col, t.alias("t"),
        F.window(F.col(ts_col), bucket)["start"].alias("__bkt"),
    )
    wl = Window.partitionBy(key_col, "__bkt").orderBy(ts_col, tie_col)
    local = (
        ev.withColumn("next_t", F.lead("t").over(wl))
        .withColumn("next_ts", F.lead(ts_col).over(wl))
        .filter(F.col("next_t").isNotNull())
        .select(key_col, ts_col, "t", "next_ts", "next_t")
    )
    # one row per present (key, bucket): its sequence-first and -last event
    bounds = ev.groupBy(key_col, "__bkt").agg(
        F.min(F.struct(ts_col, tie_col, "t")).alias("__first"),
        F.max(F.struct(ts_col, tie_col, "t")).alias("__last"),
    )
    wu = Window.partitionBy(key_col).orderBy("__bkt")
    stitch = (
        bounds.withColumn("__prev_last", F.lag("__last").over(wu))
        .filter(F.col("__prev_last").isNotNull())
        .select(
            key_col,
            F.col(f"__prev_last.{ts_col}").alias(ts_col),
            F.col("__prev_last.t").alias("t"),
            F.col(f"__first.{ts_col}").alias("next_ts"),
            F.col("__first.t").alias("next_t"),
        )
    )
    pairs = local.unionByName(stitch).filter(
        F.col("next_t") - F.col("t") > min_gap_s * 1_000_000
    )
    return pairs.select(
        key_col,
        F.col(ts_col).alias("gap_start"),
        F.col("next_ts").alias("gap_end"),
        ((F.col("next_t") - F.col("t")) / F.lit(1_000_000.0)).alias("gap_s"),
    )
