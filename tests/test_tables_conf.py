"""tables.load session-conf contract (round-5 hardening).

A library loader must not silently flip session-wide switches: sessions
built by ``session.get_spark`` already carry the engine contract (UTC
timezone, scan-level LTZ inference, nanos shim), so ``load`` is read-only
on them. A FOREIGN session that deviates is pinned — with an explicit
one-time warning — because every declared query's semantics (and the
differential oracle) depend on the UTC contract.
"""

import datetime as dt
import warnings

import pyarrow as pa
import pyarrow.parquet as pq

from ideafast_etl_spark import tables

_CONTRACT_KEYS = (
    "spark.sql.session.timeZone",
    "spark.sql.parquet.inferTimestampNTZ.enabled",
    "spark.sql.legacy.parquet.nanosAsLong",
)


def _write_events(path, unit="us"):
    table = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "user_id": pa.array([7, 7], pa.int64()),
            "ts": pa.array(
                [dt.datetime(2024, 1, 1, 10), dt.datetime(2024, 1, 1, 11)],
                pa.timestamp(unit),
            ),
        }
    )
    pq.write_table(table, str(path))


def test_load_leaves_own_session_conf_untouched(spark, tmp_path):
    d = tmp_path / "sf"
    d.mkdir()
    _write_events(d / "events.parquet")
    before = {k: spark.conf.get(k) for k in _CONTRACT_KEYS}
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # any pin-warning fails the test
        tables.load(spark, "events", str(d))
    after = {k: spark.conf.get(k) for k in _CONTRACT_KEYS}
    assert before == after


def test_load_pins_deviating_foreign_session_with_warning(spark, tmp_path):
    d = tmp_path / "sf"
    d.mkdir()
    _write_events(d / "events.parquet")
    foreign = spark.newSession()
    foreign.conf.set("spark.sql.session.timeZone", "America/New_York")
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        df = tables.load(foreign, "events", str(d))
        first = df.orderBy("event_id").first()["ts"]
    assert any("pinned session conf" in str(w.message) for w in caught)
    assert foreign.conf.get("spark.sql.session.timeZone") == "UTC"
    # wall-clock preserved under the pinned UTC session
    assert (first.hour, first.minute) == (10, 0)


def test_load_caches_dataframe_per_session_and_path(spark, tmp_path):
    d = tmp_path / "sf"
    d.mkdir()
    _write_events(d / "events.parquet")
    a = tables.load(spark, "events", str(d))
    b = tables.load(spark, "events", str(d))
    assert a is b  # immutable plan handle reused — no re-analysis
    # a different session resolves its own plan
    other = spark.newSession()
    c = tables.load(other, "events", str(d))
    assert c is not a
