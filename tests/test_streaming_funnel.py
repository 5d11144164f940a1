"""Stateful streaming funnel (streaming/stateful.py::funnel_track):
per-user stage machine across micro-batches, equivalence with the batch
funnel semantics, bounded state."""

import datetime as dt

from pyspark.sql import functions as F

from ideafast_etl_spark.streaming.stateful import funnel_track

STAGES = ["view", "click", "purchase"]


def _ts(m):
    return dt.datetime(2024, 1, 1, 0, m)


def _write(spark, path, rows):
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    ).coalesce(1).write.mode("append").parquet(path)


def test_funnel_advances_across_batches(spark, tmp_path):
    d = str(tmp_path / "ev")
    # batch 1: u1 views+clicks; u2 clicks first (no view yet -> no advance)
    _write(spark, d, [
        (1, _ts(1), 1, "view"),
        (2, _ts(2), 1, "click"),
        (3, _ts(1), 2, "click"),
        (4, _ts(3), 2, "view"),
    ])
    # batch 2: u1 purchases; u2 clicks AFTER its view -> advances to click;
    # a second u1 view must NOT re-emit stage 1 (state persists)
    _write(spark, d, [
        (5, _ts(10), 1, "purchase"),
        (6, _ts(11), 1, "view"),
        (7, _ts(12), 2, "click"),
    ])
    stream = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, event_type string"
    ).option("maxFilesPerTrigger", 1).parquet(d)
    q = (
        funnel_track(stream, STAGES)
        .writeStream.format("memory")
        .queryName("funnel")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = sorted(
        map(
            tuple,
            spark.sql(
                "select user_id, stage, stage_name from funnel"
            ).collect(),
        )
    )
    assert rows == [
        (1, 1, "view"),
        (1, 2, "click"),
        (1, 3, "purchase"),
        (2, 1, "view"),
        (2, 2, "click"),
    ]


def test_funnel_strict_time_order_within_batch(spark, tmp_path):
    d = str(tmp_path / "ev2")
    # click at the SAME timestamp as view: strictly-greater rule rejects it
    _write(spark, d, [
        (1, _ts(5), 7, "view"),
        (2, _ts(5), 7, "click"),
        (3, _ts(6), 7, "click"),
    ])
    stream = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, event_type string"
    ).parquet(d)
    q = (
        funnel_track(stream, STAGES)
        .writeStream.format("memory")
        .queryName("funnel2")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = sorted(
        map(tuple, spark.sql("select stage, event_funnel2.ts from (select * from funnel2) event_funnel2").collect())
    )
    assert [r[0] for r in rows] == [1, 2]
    assert rows[1][1] == _ts(6)  # the later click, not the tied one


def test_funnel_matches_batch_query_on_fixture_slice(spark):
    """Streaming funnel stage counts over a time-ordered fixture slice must
    equal the batch event_funnel construction on the same rows."""
    from ideafast_etl_spark import tables

    ev = (
        tables.load(spark, "events", "/root/testdata/sf0.001")
        .filter(F.col("user_id") < 30)
        .select("event_id", "ts", "user_id", "event_type")
    )
    # batch reference: first view, first click after, first purchase after
    v = ev.filter(F.col("event_type") == "view").groupBy("user_id").agg(F.min("ts").alias("t1"))
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id").filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id").agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id").filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id").agg(F.min("ts").alias("t3"))
    )
    want = (v.count(), c.count(), p.count())

    import tempfile

    with tempfile.TemporaryDirectory() as d:
        ev.orderBy("ts").coalesce(1).write.parquet(d + "/ev")
        stream = spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string"
        ).parquet(d + "/ev")
        q = (
            funnel_track(stream, STAGES)
            .writeStream.format("memory")
            .queryName("funnel3")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        got = tuple(
            spark.sql(
                "select stage, count(*) n from funnel3 group by stage order by stage"
            ).toPandas()["n"]
        )
    assert got == want


def test_funnel_ttl_same_results_when_not_expired(spark, tmp_path):
    """ttl_ms switches on ProcessingTimeTimeout; with a TTL far beyond the
    run, output is identical to the NoTimeout path."""
    d = str(tmp_path / "ev_ttl")
    _write(spark, d, [
        (1, _ts(1), 1, "view"),
        (2, _ts(2), 1, "click"),
        (3, _ts(3), 1, "purchase"),
        (4, _ts(4), 2, "view"),
    ])
    stream = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, event_type string"
    ).parquet(d)
    q = (
        funnel_track(stream, STAGES, ttl_ms=3_600_000)
        .writeStream.format("memory")
        .queryName("funnel_ttl")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = sorted(
        map(tuple, spark.sql("select user_id, stage from funnel_ttl").collect())
    )
    assert rows == [(1, 1), (1, 2), (1, 3), (2, 1)]
