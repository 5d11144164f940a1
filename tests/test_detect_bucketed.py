"""Skew-proof bucketed twins of the detection operators (r8): CUSUM's
closed form (prefix sum − floored running min) and rolling-z's trailing
moments (differences of inclusive prefix sums + one lagging equi-join)
both decompose over (key, time-bucket). The bucketed plans must be
BIT-identical to the single-window plans on every stitch topology:
minima on either side of a bucket boundary, front-loaded drift (the zero
floor), empty-bucket holes, trailing windows spanning several buckets,
and randomized hot-entity fuzz."""

import datetime as dt
import random

from ideafast_etl_spark.operators.timeseries import cusum_drift, rolling_zscore

SCHEMA = "event_id long, user_id long, ts timestamp, value double"
T0 = dt.datetime(2024, 3, 1)


def _ev(i, user, minutes, value):
    return (i, user, T0 + dt.timedelta(minutes=minutes), float(value))


def _cusum_both(spark, rows, threshold, bucket="1 day"):
    df = spark.createDataFrame(rows, SCHEMA)
    plain = sorted(map(tuple, cusum_drift(df, threshold=threshold).collect()))
    bkt = sorted(
        map(
            tuple,
            cusum_drift(df, threshold=threshold, bucket=bucket).collect(),
        )
    )
    return plain, bkt


def _rollz_both(spark, rows, k, thr=1.0, bucket="1 day"):
    df = spark.createDataFrame(rows, SCHEMA)
    plain = sorted(
        map(tuple, rolling_zscore(df, k=k, z_threshold=thr).collect())
    )
    bkt = sorted(
        map(
            tuple,
            rolling_zscore(df, k=k, z_threshold=thr, bucket=bucket).collect(),
        )
    )
    return plain, bkt


def test_cusum_level_shift_across_buckets(spark):
    # low values on day 1, shifted-up values on day 3 (empty day 2): the
    # running min settles in bucket 1 and the drift fires in bucket 3,
    # exercising the prior-bucket-min arm of the stitch across a hole
    rows = [_ev(i, 1, i * 60, 10.0) for i in range(12)]
    rows += [_ev(100 + i, 1, 2 * 24 * 60 + i * 60, 20.0) for i in range(12)]
    plain, bkt = _cusum_both(spark, rows, threshold=3.0)
    assert bkt == plain and len(plain) > 0


def test_cusum_front_loaded_shift_zero_floor_bucketed(spark):
    # drift at the very START of the series: every prefix sum is
    # positive, so min(0, ...) must clamp on the bucketed path too —
    # first bucket has NO prior-bucket min (the NULL-coalesce arm)
    rows = [_ev(i, 2, i * 60, 30.0) for i in range(6)]
    rows += [_ev(10 + i, 2, 24 * 60 + i * 60, 10.0) for i in range(20)]
    plain, bkt = _cusum_both(spark, rows, threshold=2.0)
    assert bkt == plain and len(plain) > 0


def test_cusum_min_in_later_bucket_wins(spark):
    # the global minimum of P occurs in a LATER bucket than the drift
    # onset: the stitch must track min(prior-min, local) not just carry
    # the first bucket's min
    rows = [_ev(i, 3, i * 60, 15.0) for i in range(8)]
    rows += [_ev(20 + i, 3, 24 * 60 + i * 60, 1.0) for i in range(8)]
    rows += [_ev(40 + i, 3, 2 * 24 * 60 + i * 60, 25.0) for i in range(10)]
    plain, bkt = _cusum_both(spark, rows, threshold=2.0)
    assert bkt == plain and len(plain) > 0


def test_rollz_window_spans_many_buckets(spark):
    # k=24 but only ~6 events per day: every trailing window spans 4-5
    # buckets, so the lagging prefix join reaches far behind the current
    # bucket; a planted outlier must score identically on both paths
    rows = [
        _ev(i, 4, i * 4 * 60, 10.0 + (i % 5) * 0.5) for i in range(40)
    ]
    rows.append(_ev(99, 4, 41 * 4 * 60, 50.0))
    plain, bkt = _rollz_both(spark, rows, k=24, thr=2.0)
    assert bkt == plain and len(plain) > 0


def test_rollz_first_full_window_boundary(spark):
    # exactly k+1 events: only the last row scores (g = k+1 probes the
    # virtual idx-0 prefix, the NULL-coalesce arm of the lagging join)
    k = 6
    rows = [_ev(i, 5, i * 60, 10.0 + (i % 3) * 0.5) for i in range(k)]
    rows.append(_ev(50, 5, k * 60, 40.0))
    plain, bkt = _rollz_both(spark, rows, k=k, thr=1.0)
    assert bkt == plain and len(plain) == 1


def test_rollz_fewer_than_full_window_scores_nothing(spark):
    rows = [_ev(i, 6, i * 60, 10.0 + i) for i in range(5)]
    plain, bkt = _rollz_both(spark, rows, k=24)
    assert bkt == plain == []


def test_fuzz_hot_user_parity(spark):
    # 30% hot user + uniform tail, values with a planted late shift on
    # the hot user; both detectors bit-identical across plans
    rng = random.Random(1234)
    rows = []
    i = 0
    for _ in range(4000):
        user = 0 if rng.random() < 0.3 else rng.randint(1, 40)
        m = rng.uniform(0, 30 * 24 * 60)
        v = rng.gauss(10, 2) + (
            6 if (user == 0 and m > 15 * 24 * 60) else 0
        )
        rows.append(_ev(i, user, m, round(v, 3)))
        i += 1
    c_plain, c_bkt = _cusum_both(spark, rows, threshold=1.0)
    assert c_bkt == c_plain and len(c_plain) > 0
    z_plain, z_bkt = _rollz_both(spark, rows, k=24, thr=2.5)
    assert z_bkt == z_plain and len(z_plain) > 0


def test_twa_bucketed_parity(spark):
    # LOCF integral across bucket boundaries and empty-bucket holes: the
    # boundary hold interval (prev bucket's last event → next present
    # bucket's first) must contribute exactly once; single-obs keys keep
    # the NULL twa
    from ideafast_etl_spark.operators.timeseries import time_weighted_avg

    rows = [
        _ev(1, 1, 10, 5.0),
        _ev(2, 1, 23 * 60 + 50, 7.0),      # holds across midnight
        _ev(3, 1, 24 * 60 + 30, 9.0),
        _ev(4, 1, 3 * 24 * 60 + 5, 11.0),  # holds across an empty day
        _ev(5, 2, 100, 42.0),              # single obs: twa NULL
    ]
    rng = random.Random(5)
    i = 10
    for _ in range(500):  # hot user over 6 days
        rows.append(_ev(i, 9, rng.uniform(0, 6 * 24 * 60), round(rng.gauss(8, 3), 3)))
        i += 1
    df = spark.createDataFrame(rows, SCHEMA)
    plain = sorted(map(tuple, time_weighted_avg(df).collect()))
    bkt = sorted(map(tuple, time_weighted_avg(df, bucket="1 day").collect()))
    assert bkt == plain
    assert any(r[0] == 2 and r[3] is None for r in plain)


def test_cusum_bucketed_matches_textbook_recursion(spark):
    # independent ground truth: replay the textbook recursion in python
    # against the BUCKETED plan's surviving rows
    rng = random.Random(9)
    rows = [
        _ev(i, 7, i * 37, round(rng.gauss(5, 1) + (4 if i > 60 else 0), 3))
        for i in range(100)
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    out = {
        r["event_id"]: r["drift"]
        for r in cusum_drift(df, threshold=1.0, bucket="1 day").collect()
    }
    vals = [(r[0], round(r[3] * 10**6)) for r in rows]  # micro-units
    n = len(vals)
    sx = sum(v for _, v in vals)
    s = 0
    expected = {}
    for eid, v in vals:
        s = max(0, s + (v * n - sx))
        drift_micro = (2 * s + n) // (2 * n)  # half-up
        if s > round(1.0 * 10**6) * n:
            expected[eid] = drift_micro / 10**6
    assert set(out) == set(expected)
    for eid, d in expected.items():
        assert abs(out[eid] - d) < 1e-9
