"""Skew-proof two-phase sessionization (operators/sessions.py): the
bucketed plan must be bit-identical to the single-window plan on every
stitch topology — sessions crossing one boundary, a single session
spanning MANY buckets (merge chain), sessions bridging an empty bucket,
exact-gap boundaries, and randomized fuzz."""

import datetime as dt
import random

from ideafast_etl_spark.operators.sessions import sessionize

SCHEMA = "event_id long, user_id long, ts timestamp"
T0 = dt.datetime(2024, 3, 1)


def _ev(i, user, minutes):
    return (i, user, T0 + dt.timedelta(minutes=minutes))


def _both(spark, rows, bucket="1 day", gap="INTERVAL 30 MINUTES"):
    df = spark.createDataFrame(rows, SCHEMA)
    plain = sorted(map(tuple, sessionize(df, gap=gap).collect()))
    bucketed = sorted(map(tuple, sessionize(df, gap=gap, bucket=bucket).collect()))
    return plain, bucketed


def test_session_crossing_midnight(spark):
    # events at 23:50 and 00:10 next day: one session across the boundary
    rows = [_ev(1, 7, 23 * 60 + 50), _ev(2, 7, 24 * 60 + 10)]
    plain, bucketed = _both(spark, rows)
    assert bucketed == plain
    assert len(bucketed) == 1 and bucketed[0][2] == 2


def test_merge_chain_spanning_many_buckets(spark):
    # a heartbeat every 20 minutes for 3 days: ONE session over 4 buckets
    rows = [_ev(i, 3, i * 20) for i in range(0, 3 * 72 + 1)]
    plain, bucketed = _both(spark, rows)
    assert bucketed == plain
    assert len(bucketed) == 1


def test_session_bridges_empty_bucket_not_merged(spark):
    # activity on day 1 and day 3 only; the 2-day hole exceeds the gap, so
    # the lag-to-previous-PRESENT-bucket stitch must NOT merge
    rows = [_ev(1, 5, 10), _ev(2, 5, 2 * 24 * 60 + 10)]
    plain, bucketed = _both(spark, rows)
    assert bucketed == plain
    assert len(bucketed) == 2


def test_wide_gap_session_bridges_empty_bucket_merged(spark):
    # with a 3-day gap parameter, the same hole IS one session — the
    # stitch across the empty bucket must merge
    rows = [_ev(1, 5, 10), _ev(2, 5, 2 * 24 * 60 + 10)]
    plain, bucketed = _both(spark, rows, gap="INTERVAL 3 DAYS")
    assert bucketed == plain
    assert len(bucketed) == 1


def test_exact_gap_boundary_inclusive(spark):
    # exactly 30 minutes apart (NOT > gap) stays one session, on both the
    # in-bucket and the cross-bucket path
    rows = [
        _ev(1, 9, 0), _ev(2, 9, 30),                      # in-bucket
        _ev(3, 9, 23 * 60 + 45), _ev(4, 9, 24 * 60 + 15),  # cross-bucket
    ]
    plain, bucketed = _both(spark, rows)
    assert bucketed == plain


def test_fuzz_many_users_random_times(spark):
    rng = random.Random(42)
    rows = []
    i = 0
    for user in range(12):
        t = 0.0
        for _ in range(rng.randint(5, 120)):
            t += rng.choice([1, 5, 29, 30, 31, 65, 24 * 60 - 5, 24 * 60 + 5])
            rows.append(_ev(i, user, t))
            i += 1
    # hot user: 30% of all events
    t = 0.0
    for _ in range(len(rows) // 2):
        t += rng.choice([2, 28, 45, 600])
        rows.append(_ev(i, 999, t))
        i += 1
    plain, bucketed = _both(spark, rows)
    assert bucketed == plain and len(bucketed) > 20


def test_gaps_and_transitions_bucketed_parity(spark):
    """The other two hot-entity window twins (heartbeat_gaps /
    transition_counts with bucket='1 day') must match their single-window
    plans on cross-bucket adjacency: a gap spanning midnight, a gap
    spanning an empty day, transitions crossing both."""
    import datetime as dt
    from pyspark.sql import functions as F
    from ideafast_etl_spark.operators.timeseries import (
        heartbeat_gaps,
        transition_counts,
    )

    t0 = dt.datetime(2024, 3, 1)
    rows = []
    i = 0
    types = ["view", "click", "purchase"]
    for user in (1, 2):
        for m in (10, 50, 23 * 60 + 55, 24 * 60 + 5, 24 * 60 + 30,
                  3 * 24 * 60 + 10, 3 * 24 * 60 + 20):
            rows.append((i, user, t0 + dt.timedelta(minutes=m),
                         types[i % 3]))
            i += 1
    # hot user with dense events over 4 days
    for m in range(0, 4 * 24 * 60, 7):
        rows.append((i, 99, t0 + dt.timedelta(minutes=m), types[i % 3]))
        i += 1
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )

    g_plain = sorted(map(tuple, heartbeat_gaps(ev, min_gap_s=1800).collect()))
    g_bkt = sorted(
        map(tuple, heartbeat_gaps(ev, min_gap_s=1800, bucket="1 day").collect())
    )
    assert g_bkt == g_plain and len(g_plain) >= 4  # incl. cross-day gaps

    t_plain = sorted(map(tuple, transition_counts(ev).collect()))
    t_bkt = sorted(map(tuple, transition_counts(ev, bucket="1 day").collect()))
    assert t_bkt == t_plain and sum(r[2] for r in t_plain) == len(rows) - 3
