"""Time-series resampling (operators/timeseries.py): grid construction,
LOCF, linear interpolation, edge fallbacks, and the transition matrix."""

import datetime as dt

from pyspark.sql import functions as F

from ideafast_etl_spark.operators.timeseries import (
    resample_gapfill,
    transition_counts,
)


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )


def _h(h):
    return dt.datetime(2024, 3, 1, h)


def test_gapfill_locf_and_interp(spark):
    # user 1: obs at hour 0 (value 10) and hour 4 (value 30) -> 3-hour gap
    df = _ev(spark, [(1, _h(0), 1, 10.0), (2, _h(4), 1, 30.0)])
    out = {
        r["bucket_ts"].hour: r.asDict()
        for r in resample_gapfill(df, "user_id", "ts", "value").collect()
    }
    assert sorted(out) == [0, 1, 2, 3, 4]  # full grid, gaps included
    assert out[0]["v_obs"] == 10.0 and out[4]["v_obs"] == 30.0
    assert out[2]["v_obs"] is None and out[2]["n_obs"] == 0
    # LOCF carries 10.0 through the gap
    assert [out[h]["v_locf"] for h in range(5)] == [10.0, 10.0, 10.0, 10.0, 30.0]
    # linear interpolation: 10 + (30-10) * h/4
    assert [out[h]["v_interp"] for h in range(5)] == [10.0, 15.0, 20.0, 25.0, 30.0]


def test_gapfill_bucket_mean_and_leading_edge(spark):
    # two obs in the same bucket average; a bucket before any obs has no
    # LOCF and interp falls back to the next observation
    df = _ev(
        spark,
        [
            (1, _h(2), 7, 4.0),
            (2, dt.datetime(2024, 3, 1, 2, 30), 7, 6.0),
            (3, _h(0), 7, 1.0),
        ],
    )
    out = {
        r["bucket_ts"].hour: r.asDict()
        for r in resample_gapfill(df, "user_id", "ts", "value").collect()
    }
    assert out[2]["v_obs"] == 5.0 and out[2]["n_obs"] == 2
    assert out[1]["v_obs"] is None
    assert out[1]["v_interp"] == 3.0  # midpoint of 1.0 and 5.0
    assert out[0]["v_locf"] == 1.0


def test_gapfill_grid_is_per_key(spark):
    df = _ev(spark, [(1, _h(0), 1, 1.0), (2, _h(9), 1, 2.0), (3, _h(5), 2, 3.0)])
    out = resample_gapfill(df, "user_id", "ts", "value")
    n_by_key = {
        r["user_id"]: r["n"]
        for r in out.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    assert n_by_key == {1: 10, 2: 1}  # span/step + 1 per key, not global


def test_transition_counts_shares(spark):
    rows = [
        (1, _h(0), 1, "view"),
        (2, _h(1), 1, "click"),
        (3, _h(2), 1, "view"),
        (4, _h(0), 2, "view"),
        (5, _h(1), 2, "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    out = {
        (r["prev_type"], r["next_type"]): (r["n"], r["share"])
        for r in transition_counts(df).collect()
    }
    assert out[("view", "click")] == (1, 0.5)
    assert out[("view", "purchase")] == (1, 0.5)
    assert out[("click", "view")] == (1, 1.0)
    assert len(out) == 3  # no transition crosses users


def test_time_weighted_avg_step_integral(spark):
    from ideafast_etl_spark.operators.timeseries import time_weighted_avg

    # 10 held for 1h, then 30 held for 3h; the last observation bounds the
    # span but contributes no interval of its own
    df = _ev(spark, [(1, _h(0), 1, 10.0), (2, _h(1), 1, 30.0), (3, _h(4), 1, 99.0)])
    (r,) = time_weighted_avg(df).collect()
    assert r["n_obs"] == 3
    assert r["span_us"] == 4 * 3600 * 1_000_000
    assert r["twa"] == 25.0  # (10*1 + 30*3) / 4


def test_time_weighted_avg_single_obs_null(spark):
    from ideafast_etl_spark.operators.timeseries import time_weighted_avg

    (r,) = time_weighted_avg(_ev(spark, [(1, _h(0), 5, 7.0)])).collect()
    assert r["twa"] is None and r["span_us"] == 0 and r["n_obs"] == 1


def test_time_weighted_avg_vs_plain_mean(spark):
    from ideafast_etl_spark.operators.timeseries import time_weighted_avg

    # burst of samples at value 100 must NOT dominate: 0 held for 10h,
    # then three rapid 100s in the last hour
    rows = [(1, _h(0), 1, 0.0)] + [
        (i + 2, dt.datetime(2024, 3, 1, 10, m), 1, 100.0) for i, m in enumerate((0, 20, 40))
    ] + [(9, _h(11), 1, 100.0)]
    (r,) = time_weighted_avg(_ev(spark, rows)).collect()
    # plain mean of values = 60; TWA = (0*10h + 100*1h)/11h
    assert abs(r["twa"] - 100.0 / 11.0) < 1e-6


def test_cusum_closed_form_matches_recursion(spark):
    from ideafast_etl_spark.operators.timeseries import cusum_drift

    vals = [10.0, 10.0, 10.0, 10.0, 50.0, 55.0, 60.0, 10.0, 65.0]
    rows = [(i, _h(i), 1, v) for i, v in enumerate(vals)]
    thr = 20.0
    got = {
        r["event_id"]: r["drift"]
        for r in cusum_drift(_ev(spark, rows), threshold=thr).collect()
    }
    # python twin: the textbook recursion
    mean = sum(vals) / len(vals)
    s, want = 0.0, {}
    for i, v in enumerate(vals):
        s = max(0.0, s + (v - mean))
        if s > thr:
            want[i] = s
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-5, (k, got[k], want[k])


def test_cusum_front_loaded_shift(spark):
    """Drift at the START of the series: every prefix sum of (x - mean) is
    non-negative, so the closed form needs the min(0, ...) floor — without
    it S collapses to 0 everywhere and the shift is never flagged."""
    from ideafast_etl_spark.operators.timeseries import cusum_drift

    vals = [100.0, 0.0, 0.0, 0.0]  # mean 25; recursion S = [75, 50, 25, 0]
    rows = [(i, _h(i), 1, v) for i, v in enumerate(vals)]
    thr = 20.0
    got = {
        r["event_id"]: r["drift"]
        for r in cusum_drift(_ev(spark, rows), threshold=thr).collect()
    }
    mean = sum(vals) / len(vals)
    s, want = 0.0, {}
    for i, v in enumerate(vals):
        s = max(0.0, s + (v - mean))
        if s > thr:
            want[i] = s
    assert want == {0: 75.0, 1: 50.0, 2: 25.0}  # the scenario is real
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-5, (k, got[k], want[k])
