"""SCD2 dimension merge: version open/close semantics, idempotent
re-application, multi-batch history, as-of readback (operators/scd2.py)."""

from datetime import datetime

from pyspark.sql import functions as F

from ideafast_etl_spark.operators.scd2 import scd2_apply, scd2_init


def _dim(spark):
    snap = spark.createDataFrame(
        [(1, "A"), (2, "B"), (3, "C")], "k long, attr string"
    )
    return scd2_init(snap, ["k"], ["attr"], eff_date="2020-01-01")


def _upd(spark, rows):
    return spark.createDataFrame(rows, "k long, attr string")


def test_changed_key_closes_and_opens_version(spark):
    out = scd2_apply(
        _dim(spark), _upd(spark, [(2, "B2")]), ["k"], ["attr"], "2021-06-01"
    ).collect()
    rows = {(r["k"], r["attr"], r["valid_from"], r["valid_to"]) for r in out}
    jan20 = datetime(2020, 1, 1)
    jun21 = datetime(2021, 6, 1)
    assert rows == {
        (1, "A", jan20, None),
        (3, "C", jan20, None),
        (2, "B", jan20, jun21),   # closed
        (2, "B2", jun21, None),   # new open version
    }


def test_identical_update_is_noop_and_new_key_inserts(spark):
    dim = _dim(spark)
    out = scd2_apply(
        dim, _upd(spark, [(1, "A"), (9, "Z")]), ["k"], ["attr"], "2021-06-01"
    )
    rows = {(r["k"], r["attr"], r["valid_from"], r["valid_to"]) for r in out.collect()}
    jan20 = datetime(2020, 1, 1)
    jun21 = datetime(2021, 6, 1)
    assert rows == {
        (1, "A", jan20, None),    # unchanged — NOT re-versioned
        (2, "B", jan20, None),
        (3, "C", jan20, None),
        (9, "Z", jun21, None),    # brand-new key
    }
    # idempotent: re-applying the same batch later changes nothing
    again = scd2_apply(
        out, _upd(spark, [(1, "A"), (9, "Z")]), ["k"], ["attr"], "2022-01-01"
    )
    assert {
        (r["k"], r["attr"], r["valid_from"], r["valid_to"])
        for r in again.collect()
    } == rows


def test_multi_batch_history_supports_as_of_reads(spark):
    dim = _dim(spark)
    dim = scd2_apply(dim, _upd(spark, [(1, "A1")]), ["k"], ["attr"], "2021-01-01")
    dim = scd2_apply(dim, _upd(spark, [(1, "A2")]), ["k"], ["attr"], "2022-01-01")
    hist = dim.filter(F.col("k") == 1).orderBy("valid_from").collect()
    assert [(r["attr"], r["valid_to"] is None) for r in hist] == [
        ("A", False), ("A1", False), ("A2", True)
    ]
    # AS-OF read: version valid at 2021-07-01 is A1
    asof = dim.filter(
        (F.col("valid_from") <= "2021-07-01")
        & (F.col("valid_to").isNull() | (F.col("valid_to") > "2021-07-01"))
    )
    assert [(r["k"], r["attr"]) for r in asof.filter(F.col("k") == 1).collect()] == [
        (1, "A1")
    ]


def test_point_in_time_fact_join_routes_by_event_date(spark):
    """Temporal dimension join: facts dated before a key's migration join
    the OLD version, later facts the new one, and every fact matches
    exactly one version (the intervals partition the timeline)."""
    import datetime as dt

    dim = _dim(spark)  # key 1 attr A, key 2 attr B, open since 2020-01-01
    dim = scd2_apply(dim, _upd(spark, [(1, "A1")]), ["k"], ["attr"], "2021-01-01")
    facts = spark.createDataFrame(
        [
            (10, 1, dt.datetime(2020, 6, 1)),   # before migration -> A
            (11, 1, dt.datetime(2021, 6, 1)),   # after -> A1
            (12, 1, dt.datetime(2021, 1, 1)),   # boundary: new version opens
            (13, 2, dt.datetime(2023, 1, 1)),   # unchanged key -> B
        ],
        "fact_id long, k long, ts timestamp",
    )
    j = facts.join(
        dim,
        (facts.k == dim.k)
        & (F.col("ts") >= F.col("valid_from"))
        & (F.col("valid_to").isNull() | (F.col("ts") < F.col("valid_to"))),
    )
    got = {r["fact_id"]: r["attr"] for r in j.collect()}
    assert got == {10: "A", 11: "A1", 12: "A1", 13: "B"}
    assert j.count() == 4  # exactly one version per fact
