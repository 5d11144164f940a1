"""Randomized cross-engine differential test for the time-series operators:
random event streams — duplicate timestamps, negative values, values
engineered to land on exact .5 rounding ties, single-observation keys —
run through the registered Spark queries AND their DuckDB oracles on the
same parquet. This is what proves the integer half-up rounding discipline
(REPRO.md pattern 7) holds on adversarial inputs, not just the fixture."""

import datetime as dt
import random

import duckdb

import __spark_entry__ as entry

QUERIES = [
    "timeseries_gapfill",
    "time_weighted_avg",
    "event_transition_matrix",
    "event_anomaly_zscore",
    "cusum_drift",
]


def _gen_events(rng: random.Random, n_users: int = 8, n_events: int = 300):
    base = dt.datetime(2024, 5, 1)
    rows = []
    for i in range(n_events):
        # users are multiples of 20 so the gapfill query's user_id % 20
        # filter keeps them
        user = 20 * rng.randrange(n_users)
        ts = base + dt.timedelta(
            minutes=rng.randrange(0, 60 * 30), microseconds=rng.randrange(0, 1_000_000)
        )
        kind = rng.random()
        if kind < 0.25:
            value = rng.randrange(1, 20) + 0.5 * rng.randrange(0, 2)  # tie bait
        elif kind < 0.45:
            value = -round(rng.uniform(0.5, 300.0), 6)  # negative sensor values
        elif kind < 0.55:
            value = rng.randrange(-5, 6) + 0.0000005  # .5 at the 7th decimal
        else:
            value = round(rng.uniform(0.01, 500.0), 6)
        etype = rng.choice(["view", "click", "purchase", "refund"])
        rows.append((i, ts, user, etype, float(value), "{}"))
    # same-instant pair for tie-break coverage + a single-observation user
    rows.append((n_events, base, 0, "view", 1.0, "{}"))
    rows.append((n_events + 1, base, 0, "click", 2.0, "{}"))
    rows.append((n_events + 2, base, 20 * (n_users + 1), "view", 7.0, "{}"))
    return rows


def test_timeseries_ops_match_oracle_on_random_events(spark, tmp_path):
    rng = random.Random(20260814)
    rows = _gen_events(rng)
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    sf_dir = str(tmp_path)
    df.coalesce(2).write.parquet(sf_dir + "/events.parquet")

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet/*.parquet'"
    )
    qs = entry.queries()
    sqls = entry.oracle_sql()
    for name in QUERIES:
        got = qs[name](spark, sf_dir).toPandas()
        want = con.execute(sqls[name]).df()
        cols = sorted(got.columns)
        assert sorted(want.columns) == cols, name
        got = got.reindex(cols, axis=1).sort_values(by=cols, ignore_index=True)
        want = want.reindex(cols, axis=1).sort_values(by=cols, ignore_index=True)
        assert got.shape == want.shape, (name, got.shape, want.shape)

        def same(a, b):
            def isnull(v):
                return v is None or v != v

            if isnull(a) and isnull(b):
                return True
            if hasattr(a, "to_pydatetime") or isinstance(a, dt.datetime):
                return str(a) == str(b)
            return a == b

        for c in cols:
            mism = [
                (i, a, b)
                for i, (a, b) in enumerate(zip(list(got[c]), list(want[c])))
                if not same(a, b)
            ][:3]
            assert not mism, (name, c, mism)
